from strake_spark.sources.registry import SOURCE_TYPES, register_source

__all__ = ["SOURCE_TYPES", "register_source"]
