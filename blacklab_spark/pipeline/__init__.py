"""Large-scale training-data pipeline operators over document tables.

These are first-class engine components alongside the corpus-retrieval
operators: deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard), similarity search over embeddings, text analysis (lang-ID,
quality, token counts, fingerprints) and multimodal plumbing.

Every deterministic operator here is expressed with JVM-side Spark SQL
expressions built from primitives that have exact DuckDB equivalents
(md5-derived 32-bit hashes, list lambdas), so each ships with an ANSI
SQL oracle in __spark_entry__.oracle_sql() and is verified value-exact.
"""

# Shared tokenizer (Unicode letters/digits; Java regex and DuckDB RE2
# both support \p{..}). SQL_TOKEN_PATTERN is the same pattern with
# backslashes doubled for embedding in Spark SQL string literals
# (Spark's SQL parser eats single backslashes; DuckDB literals don't).
TOKEN_PATTERN = r"[\p{L}\p{N}]+"
SQL_TOKEN_PATTERN = TOKEN_PATTERN.replace("\\", "\\\\")

# portable 32-bit hash: identical results in Spark and DuckDB
#   Spark : cast(conv(substr(md5(s),1,8),16,10) as bigint)
#   DuckDB: ('0x' || substr(md5(s),1,8))::BIGINT


def spark_hash32(expr: str, salt: str = "") -> str:
    s = f"concat('{salt}|', {expr})" if salt else expr
    return f"cast(conv(substr(md5({s}),1,8),16,10) as bigint)"


def duck_hash32(expr: str, salt: str = "") -> str:
    s = f"('{salt}|' || {expr})" if salt else expr
    return f"('0x' || substr(md5({s}),1,8))::BIGINT"


# portable 60-bit hash (15 md5 hex digits): the widest md5 prefix that
# fits a SIGNED 64-bit integer in both engines (16 digits can exceed
# 2^63-1 and overflow the BIGINT cast). Used for SimHash fingerprints
# wide enough to band at scale.


def spark_hash60(expr: str, salt: str = "") -> str:
    s = f"concat('{salt}|', {expr})" if salt else expr
    return f"cast(conv(substr(md5({s}),1,15),16,10) as bigint)"


def duck_hash60(expr: str, salt: str = "") -> str:
    s = f"('{salt}|' || {expr})" if salt else expr
    return f"('0x' || substr(md5({s}),1,15))::BIGINT"
