"""PySpark wrappers for graft's data sources and sinks
(``graft.sources`` on the JVM): training-shard export with an
order-independent integrity manifest, partition-pruned shard reads,
and the export verifier. Same thin-shim discipline as ``graft.ops`` —
all compute stays on the JVM.
"""

from typing import List

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "assign_shards",
    "shard_manifest",
    "write_shards",
    "read_shard",
    "verify_export",
]


def _jvm(df: DataFrame):
    return df.sparkSession.sparkContext._jvm


def _wrap(df: DataFrame, jdf) -> DataFrame:
    return DataFrame(jdf, df.sparkSession)


def _to_seq(df: DataFrame, values: List):
    return _jvm(df).org.apache.spark.api.python.PythonUtils.toSeq(values)


def _col(df: DataFrame, name: str):
    return _jvm(df).org.apache.spark.sql.functions.col(name)


def assign_shards(df: DataFrame, id_col: str, n_shards: int, seed: str) -> DataFrame:
    """Deterministic shard id in [0, n_shards): first-32-md5-bits of
    "seed:id" mod n_shards. Adds column ``shard``."""
    return _wrap(df, _jvm(df).graft.sources.ShardExport.assignShards(
        df._jdf, id_col, int(n_shards), seed))


def shard_manifest(
    sharded: DataFrame,
    id_col: str,
    content_cols: List[str],
    token_col: str,
) -> DataFrame:
    """Per-shard manifest over an :func:`assign_shards`-tagged frame:
    (shard, n_rows, n_tokens, digest) with an order-independent XOR
    digest. token_col names a long-castable column to sum."""
    return _wrap(sharded, _jvm(sharded).graft.sources.ShardExport.manifest(
        sharded._jdf, id_col, _to_seq(sharded, content_cols), _col(sharded, token_col)))


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    content_cols: List[str],
    token_col: str,
    n_shards: int,
    seed: str,
) -> DataFrame:
    """Export df as n_shards deterministic shards under path/data plus
    path/manifest; returns the manifest. Re-running with the same input
    and seed reproduces identical shards and digests."""
    return _wrap(df, _jvm(df).graft.sources.ShardExport.writeShards(
        df._jdf, path, id_col, _to_seq(df, content_cols), _col(df, token_col),
        int(n_shards), seed))


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """Open one shard of an export (partition-pruned read)."""
    jdf = spark.sparkContext._jvm.graft.sources.ShardExport.readShard(
        spark._jsparkSession, path, int(shard))
    return DataFrame(jdf, spark)


def verify_export(
    spark: SparkSession,
    path: str,
    id_col: str,
    content_cols: List[str],
    token_col: str,
) -> DataFrame:
    """Re-derive the manifest from the data files and return mismatching
    shards (empty = export intact)."""
    jvm = spark.sparkContext._jvm
    cols = jvm.org.apache.spark.api.python.PythonUtils.toSeq(content_cols)
    jdf = jvm.graft.sources.ShardExport.verifyExport(
        spark._jsparkSession, path, id_col, cols,
        jvm.org.apache.spark.sql.functions.col(token_col))
    return DataFrame(jdf, spark)
