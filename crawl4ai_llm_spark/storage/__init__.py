from crawl4ai_llm_spark.storage.store import ListResult, ProductStore

__all__ = ["ProductStore", "ListResult"]
