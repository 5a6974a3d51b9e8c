"""Validating record models mirroring the reference's Pydantic surface.

Parity: reference ``crawl4ai_llm/models.py:13-77`` declares
``ProductPrice`` / ``ProductImage`` / ``ProductData`` with required-field
and ``HttpUrl`` validation. The engine stores schema-on-read dicts
(SURVEY.md §1.1), so validation is OPTIONAL here — these dataclasses give
reference callers the same up-front type/URL checks (raising ``ValueError``
where Pydantic raises ``ValidationError``) and a ``to_record()`` that feeds
``ProductStore.save_products`` directly. No Pydantic dependency: the
sandbox doesn't ship it, and the checks are a dozen lines.

``extracted_at``/``source_html`` are accepted and passed through.
``metadata`` follows the reference's merge semantics (json_storage.py:
189-192): caller-supplied keys are PRESERVED and the engine stamps
``created_at``/``updated_at`` into the same struct on save — so a record
fetched with ``get_product`` round-trips through ``save_products``
unchanged (ADVICE r03 closure).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any
from urllib.parse import urlparse


def _require_http_url(url: Any, what: str) -> str:
    if not isinstance(url, str) or not url:
        raise ValueError(f"{what}: url is required and must be a string")
    scheme = urlparse(url).scheme.lower()
    if scheme not in ("http", "https") or not urlparse(url).netloc:
        raise ValueError(f"{what}: not an http(s) URL: {url!r}")
    return url


@dataclass
class ProductPrice:
    """ref models.py:13-22 — amount/currency required, both strings."""

    amount: str
    currency: str
    original_amount: str | None = None
    discount_percentage: float | None = None

    def __post_init__(self):
        if not isinstance(self.amount, str) or not self.amount:
            raise ValueError("ProductPrice: amount is required and must be a string")
        if not isinstance(self.currency, str) or not self.currency:
            raise ValueError("ProductPrice: currency is required and must be a string")

    def to_record(self) -> dict[str, Any]:
        return {
            "amount": self.amount,
            "currency": self.currency,
            "original_amount": self.original_amount,
            "discount_percentage": self.discount_percentage,
        }


@dataclass
class ProductImage:
    """ref models.py:25-30 — url required and must be http(s)."""

    url: str
    alt: str | None = None
    position: int | None = None

    def __post_init__(self):
        _require_http_url(self.url, "ProductImage")

    def to_record(self) -> dict[str, Any]:
        return {"url": self.url, "alt": self.alt, "position": self.position}


@dataclass
class ProductData:
    """ref models.py:32-77 — title + http(s) url required; optional
    collections default empty, exactly the reference's field surface."""

    title: str
    url: str
    description: str | None = None
    brand: str | None = None
    prices: list[ProductPrice] = field(default_factory=list)
    images: list[ProductImage] = field(default_factory=list)
    identifiers: dict[str, str] = field(default_factory=dict)
    attributes: dict[str, Any] = field(default_factory=dict)
    variants: list[dict[str, Any]] = field(default_factory=list)
    available: bool | None = None
    availability_text: str | None = None

    def __post_init__(self):
        if not isinstance(self.title, str) or not self.title:
            raise ValueError("ProductData: title is required and must be a string")
        _require_http_url(self.url, "ProductData")
        self.prices = [
            p if isinstance(p, ProductPrice) else ProductPrice(**p) for p in self.prices
        ]
        self.images = [
            i if isinstance(i, ProductImage) else ProductImage(**i) for i in self.images
        ]
        if not all(
            isinstance(k, str) and isinstance(v, str) for k, v in self.identifiers.items()
        ):
            raise ValueError("ProductData: identifiers must be a str→str mapping")

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ProductData":
        """Validate a raw dict (the save_product payload shape). Unknown
        keys are preserved on the record — schema-on-read parity — but the
        declared fields are type-checked like the reference model. All
        violations raise ValueError (the reference's ValidationError is a
        ValueError subclass), including missing required fields — which the
        bare dataclass constructor would surface as TypeError."""
        for required in ("title", "url"):
            if required not in d:
                raise ValueError(f"ProductData: {required} is required")
        if "metadata" in d and not isinstance(d["metadata"], dict):
            # caller metadata is preserved and merged with the engine's
            # created_at/updated_at stamps on save (reference semantics,
            # json_storage.py:189-192) — but it must be a mapping
            raise ValueError("ProductData: metadata must be a dict")
        known = {f for f in cls.__dataclass_fields__}
        model = cls(**{k: v for k, v in d.items() if k in known})
        model._extra = {k: v for k, v in d.items() if k not in known}  # type: ignore[attr-defined]
        return model

    def to_record(self) -> dict[str, Any]:
        rec = {
            "title": self.title,
            "url": self.url,
            "description": self.description,
            "brand": self.brand,
            "prices": [p.to_record() for p in self.prices],
            "images": [i.to_record() for i in self.images],
            "identifiers": self.identifiers,
            "attributes": self.attributes,
            "variants": self.variants,
            "available": self.available,
            "availability_text": self.availability_text,
        }
        rec.update(getattr(self, "_extra", {}))
        # schema-on-read: unset optional fields are ABSENT, not typeless
        # nulls (all-None / empty-collection columns cannot infer a Spark
        # type, and the reference's JSON rows simply lack unset keys)
        return {
            k: v
            for k, v in rec.items()
            if v is not None and v != [] and v != {}
        }
