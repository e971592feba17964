"""One-off sf1 (~10x sf0.1) stress dataset generator: TPC-H-ish tables
replicated with key offsets (hub/join cardinality scales properly;
values untouched), documents/embeddings synthesized fresh at 10x from
the sf0.1 vocabulary (cloning text 10x would plant adversarial
exact-dup clusters the near-dup gates would then chase — not a
representative corpus). Output: /root/repo/_stress/sf1 (gitignored).
NOT part of any gate — feeds tools/stress_sf1.py (VERDICT-r7 item 3)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mallarddv_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "_stress", "sf1")
REPS = 10

# key columns that must stay unique / join-consistent across replicas
OFFSET_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
}


def main() -> None:
    spark = get_spark(app_name="gen-stress-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    for t in ("region", "nation"):  # fixed dims: copy as-is
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{OUT}/{t}.parquet")

    for t, keys in OFFSET_KEYS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        offs = {k: base.agg(F.max(k)).first()[0] + 1 for k in keys}
        rep = spark.range(REPS).select(F.col("id").alias("__rep"))
        df = base.crossJoin(F.broadcast(rep))
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("__rep") * F.lit(offs[k]))
        df.drop("__rep").repartition(32).write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet")
        print(t, "done", flush=True)

    # documents: fresh synthesis from the sf0.1 vocabulary, 10x rows,
    # same word-count band (~10..100) and lang/source shape
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    vocab = sorted(
        r.w for r in docs.select(
            F.explode(F.split("text", " ")).alias("w")).distinct().collect()
    )
    n_docs = docs.count() * REPS
    varr = "array(" + ", ".join(f"'{w}'" for w in vocab) + ")"
    langs = "array('en','en','en','en','zh','zh','de','fr','es')"
    out = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(1, 10 + cast(pmod(xxhash64(id), 91) as int)), "
            f"i -> element_at({varr}, cast(pmod(xxhash64(id, i), {len(vocab)}) as int) + 1)), ' ')"
        ).alias("text"),
        F.expr(f"element_at({langs}, cast(pmod(xxhash64(id, -1), 9) as int) + 1)").alias("lang"),
        F.expr("concat('src', pmod(xxhash64(id, -2), 10))").alias("source"),
    ).withColumn("n_chars", F.length("text"))
    out.repartition(32).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")
    print("documents done", n_docs, flush=True)

    # embeddings: 10x rows of hash-uniform floats in [-1, 1], dim 64
    n_vec = spark.read.parquet(f"{SRC}/embeddings.parquet").count() * REPS
    emb = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), i -> cast((pmod(xxhash64(id, i), 2000001) "
            "- 1000000) / 1000000.0 as float))"
        ).alias("embedding"),
        F.expr("cast(pmod(xxhash64(id, -3), 10) as int)").alias("label"),
    )
    emb.repartition(32).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")
    print("embeddings done", n_vec, flush=True)


if __name__ == "__main__":
    main()
