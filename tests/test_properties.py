"""Property-based tests (hypothesis) for the URL/hash/filter invariants."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_llm_spark.frontier.cuckoo import CuckooFilter
from crawl4ai_llm_spark.frontier.hashing import murmur3_32
from crawl4ai_llm_spark.functions.urls import _canonicalize_one

hosts = st.from_regex(r"[A-Za-z][A-Za-z0-9\-]{0,10}(\.[A-Za-z]{2,5}){1,2}", fullmatch=True)
paths = st.from_regex(r"(/[A-Za-z0-9._\-]{0,8}){0,4}/?", fullmatch=True)
queries = st.from_regex(r"([a-z]{1,4}=[a-z0-9]{0,4}(&[a-z]{1,4}=[a-z0-9]{0,4}){0,3})?", fullmatch=True)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(hosts)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(paths)
    query = draw(queries)
    frag = draw(st.sampled_from(["", "#x", "#frag"]))
    q = f"?{query}" if query else ""
    return f"{scheme}://{host}{port}{path}{q}{frag}"


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    once = _canonicalize_one(u)
    if once is not None:
        assert _canonicalize_one(once) == once


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_invariants(u):
    c = _canonicalize_one(u)
    if c is None:
        return
    assert c.startswith(("http://", "https://"))
    assert "#" not in c  # fragment stripped
    assert ":80/" not in c.replace("http://", "", 1) or not c.startswith("http://")
    host = c.split("//")[1].split("/")[0]
    assert host == host.lower()
    if "?" in c:
        params = c.split("?", 1)[1].split("&")
        assert params == sorted(params)  # query canonicalized


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=500, deadline=None)
def test_murmur3_range_and_determinism(b):
    h = murmur3_32(b)
    assert -(2**31) <= h < 2**31
    assert murmur3_32(b) == h


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=200, unique=True))
@settings(max_examples=100, deadline=None)
def test_cuckoo_membership_property(keys):
    cf = CuckooFilter()
    arr = np.array(keys, dtype=np.int64)
    assert cf.insert(arr) == 0
    assert cf.contains(arr).all()  # no false negatives, ever
    cf.delete(arr)
    # after deleting everything inserted, table is empty again
    assert cf.table.sum() == 0
