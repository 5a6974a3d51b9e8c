from crawl4ai_llm_spark.operators import dedup, similarity, textops  # noqa: F401
