"""Write-layout operators: Z-order (Morton) clustering for data skipping.

Reference analog: none — the reference leaves file layout to the sink.
This is the Delta/Iceberg `OPTIMIZE ... ZORDER BY` capability expressed
on plain parquet: interleave the bit representations of several columns'
quantile buckets into one Morton key, range-partition + sort the write
by it, and every written file ends up covering a small hyper-rectangle
of the keyspace. Parquet row-group/file min-max stats then prune reads
that filter on ANY prefix-free subset of the z-columns — the layout that
makes a 100 TB scan-with-two-filters read 1% of its files instead of
sorting helping only the leading column.

Scale shape: one `approxQuantile` pass per column (sampled, driver gets
``2^bits`` boundaries, KB-scale), then a map-only bucket+interleave
expression and ONE range exchange for the sorted write — the same cost
as any globally-sorted write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (64 buckets each) — 2 cols -> 12-bit Morton key.
ZORDER_BITS = 6


def _bucketize(col: str, boundaries: list[float]) -> Column:
    """Quantile-bucket index via a literal sorted boundary array:
    count of boundaries <= value (codegen'd O(|boundaries|) per row)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    c = F.col(col).cast("double")
    return F.when(c.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(arr, lambda b: b <= c))
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = ZORDER_BITS
) -> tuple[DataFrame, Column]:
    """Attach `_zbucket_<col>` quantile buckets and return
    ``(df_with_buckets, morton_key_column)``. Quantile (not min/max
    uniform) bucketing keeps the key balanced under skew."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    out = df
    bucket_cols = []
    for c in cols:
        bounds = df.stat.approxQuantile(c, probs, 0.001)
        name = f"_zbucket_{c}"
        out = out.withColumn(name, _bucketize(c, bounds))
        bucket_cols.append(name)
    z = F.lit(0)
    for bit in range(bits):
        for dim, name in enumerate(bucket_cols):
            pos = bit * len(bucket_cols) + dim
            z = z + F.shiftleft(
                F.shiftrightunsigned(F.col(name), bit).bitwiseAND(F.lit(1)), pos
            )
    return out, z.alias("_zorder")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = ZORDER_BITS,
    n_files: int = 8,
    **writer_options: str,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of ``cols``:
    range-partition into ``n_files`` and sort within each, so every
    file's min-max footer covers a tight range of EVERY z-column."""
    tagged, z = zorder_key(df, cols, bits)
    (
        tagged.withColumn("_zorder", z)
        .repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder", *[f"_zbucket_{c}" for c in cols])
        .write.mode("overwrite")
        .options(**writer_options)
        .parquet(path)
    )
