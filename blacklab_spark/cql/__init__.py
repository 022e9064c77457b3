from blacklab_spark.cql.parser import parse
from blacklab_spark.cql.engine import find

__all__ = ["parse", "find"]
