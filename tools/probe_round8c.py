"""Scale probes for the round-8 late additions (run on a quiet machine;
results quoted in SURVEY §6):

1. index_delete flatness — deleting 1k docs from a near-dup index must
   cost the same whether the index holds 20k or 100k docs (the write is
   O(delete set)); the post-delete lookup pays one guarded-broadcast
   anti-join.
2. BPE round flatness — with a fixed vocabulary, growing the corpus 5×
   must grow only the FIRST pass (word counting); the 15 merge rounds
   run on the word table and stay flat.

Usage: python tools/probe_round8c.py
"""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mini_data_platform_spark.session import get_spark  # noqa: E402


def synth_docs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}tok"), (F.col("id") * (j + 3)) % 211)
                for j in range(30)
            ],
        ).alias("text"),
    )


def probe_delete(spark):
    from mini_data_platform_spark.operators.incremental import (
        index_delete,
        neardup_index_build,
        neardup_index_lookup,
    )
    from mini_data_platform_spark.operators.resources import release_plan

    print("--- probe 1: index_delete flatness")
    for n in (20_000, 100_000):
        docs = synth_docs(spark, n)
        d = tempfile.mkdtemp(prefix=f"probe_del_{n}_")
        t0 = time.time()
        neardup_index_build(docs, d, "doc_id", "text")
        t_build = time.time() - t0
        dead = docs.where(F.col("doc_id") % (n // 1000) == 0)  # ~1k ids
        t0 = time.time()
        index_delete(dead, d)
        t_del = time.time() - t0
        batch = docs.where(F.col("doc_id") < 200).select(
            (F.col("doc_id") + 10 * n).alias("doc_id"), "text"
        )
        t0 = time.time()
        out = neardup_index_lookup(batch, d)
        out.count()
        release_plan(out)
        t_lookup = time.time() - t0
        print(
            f"corpus={n}: build {t_build:.1f}s, delete-1k {t_del:.1f}s, "
            f"lookup-after-delete {t_lookup:.1f}s"
        )


def probe_bpe(spark):
    from mini_data_platform_spark.operators.bpe import bpe_learn, word_freqs

    print("--- probe 2: BPE round flatness (fixed vocab)")
    for n in (20_000, 100_000):
        docs = synth_docs(spark, n)
        t0 = time.time()
        nw = word_freqs(docs, "text").count()
        t_pass = time.time() - t0
        t0 = time.time()
        merges = bpe_learn(docs, "text", 15)
        t_learn = time.time() - t0
        print(
            f"corpus={n}: distinct words {nw}, corpus pass {t_pass:.1f}s, "
            f"full learn (pass + 15 rounds) {t_learn:.1f}s, "
            f"per round ~{(t_learn - t_pass) / 15:.2f}s, "
            f"merges learned {len(merges)}"
        )


if __name__ == "__main__":
    spark = get_spark()
    probe_delete(spark)
    probe_bpe(spark)
