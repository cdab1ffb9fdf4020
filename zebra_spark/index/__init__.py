from zebra_spark.index.lsh import LSHIndex, LSHIndexOptions

__all__ = ["LSHIndex", "LSHIndexOptions"]
