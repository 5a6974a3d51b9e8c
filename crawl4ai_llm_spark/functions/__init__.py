from crawl4ai_llm_spark.functions import text, urls, vectors  # noqa: F401
