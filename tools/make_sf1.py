"""Scale-probe data generator: sf0.1 -> sf1 by 10x keyed replication.

The driver ships sf0.001/0.01/0.1 fixtures; validating the 100 TB
extrapolations wants one real 10x step. This derives an sf1 directory
from sf0.1 with DuckDB (fast, out-of-core):

- fact/dim tables replicate 10x with primary/foreign keys shifted by a
  copy-sized span, consistently across tables, so join fan-outs match a
  real 10x scale-up (10x rows AND 10x keys; nation/region stay fixed,
  as at real TPC-H scale factors).
- events: 10x rows, 10x users, same 30-day span (10x traffic density).
- documents: doc_ids shift AND each copy's token order is shuffled by a
  copy-salted positional hash — identical length/vocabulary
  distributions, disjoint shingle sets, so copies are NOT
  near-duplicates and dedup benchmarks keep a realistic duplicate rate
  instead of 10-way clone clusters.
- embeddings: ids shift; vectors replicate unchanged (ANN perf shape is
  row count x dim; duplicate vectors only tie-break identically).

This directory is a BENCH INPUT ONLY (gitignored); the correctness gate
keeps running against the driver-shipped fixtures.
"""

import os
import sys

SRC = "/root/testdata/sf0.1"
# round 13: COPIES/DST are env-overridable so the same generator makes
# the sf10 probe input (SFN_COPIES=100 SFN_DST=.bench/sf10) — two
# measured decades instead of one for the 100 TB extrapolations
COPIES = int(os.environ.get("SFN_COPIES", "10"))
DST = os.environ.get(
    "SFN_DST",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench",
        "sf1",
    ),
)

SPANS = {
    "custkey": 100_000,
    "orderkey": 1_000_000,
    "partkey": 100_000,
    "suppkey": 10_000,
    "user_id": 10_000,
    "event_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def main():
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    rng = f"(SELECT UNNEST(range({COPIES})) AS cp)"

    def gen(table, select):
        out = os.path.join(DST, f"{table}.parquet")
        con.execute(
            f"COPY (SELECT {select} FROM read_parquet('{SRC}/{table}.parquet') t "
            f"CROSS JOIN {rng} c) TO '{out}' (FORMAT PARQUET)"
        )
        print(table, con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0])

    sh = lambda col, span: f"t.{col} + c.cp * {span} AS {col}"  # noqa: E731

    gen("customer", f"{sh('c_custkey', SPANS['custkey'])}, c_name, c_nationkey, c_acctbal, c_mktsegment")
    gen("orders", f"{sh('o_orderkey', SPANS['orderkey'])}, {sh('o_custkey', SPANS['custkey'])}, "
                  "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    gen("lineitem", f"{sh('l_orderkey', SPANS['orderkey'])}, {sh('l_partkey', SPANS['partkey'])}, "
                    f"{sh('l_suppkey', SPANS['suppkey'])}, l_linenumber, l_quantity, "
                    "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
    gen("supplier", f"{sh('s_suppkey', SPANS['suppkey'])}, s_name, s_nationkey, s_acctbal")
    gen("part", f"{sh('p_partkey', SPANS['partkey'])}, p_name, p_brand, p_type, p_size, p_retailprice")
    gen("events", f"{sh('event_id', SPANS['event_id'])}, ts, {sh('user_id', SPANS['user_id'])}, "
                  "event_type, value, props")
    # deterministically SHUFFLE each copy's token order (sort positions
    # by a copy-salted hash): same length/vocabulary distributions, but
    # shingle sets are disjoint — copies are not near-duplicates, so the
    # corpus keeps a realistic duplicate rate instead of 10-way clones.
    # (A rotation is NOT enough: it preserves every interior shingle.)
    shuffled = (
        "CASE WHEN c.cp = 0 THEN t.text ELSE array_to_string("
        " list_transform("
        "  list_sort([struct_pack(h := hash(i * 1000003 + c.cp), "
        "                         w := string_split(t.text, ' ')[i]) "
        "             FOR i IN range(1, len(string_split(t.text, ' ')) + 1)]),"
        "  x -> x.w), ' ') END"
    )
    gen("documents",
        f"{sh('doc_id', SPANS['doc_id'])}, {shuffled} AS text, lang, source, n_chars")
    gen("embeddings", f"{sh('vec_id', SPANS['vec_id'])}, embedding, label")
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{os.path.join(DST, t + '.parquet')}' (FORMAT PARQUET)"
        )
        print(t, "copied")


if __name__ == "__main__":
    sys.exit(main())
