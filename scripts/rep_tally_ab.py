"""Micro-A/B of repetition-tally variants over sf0.1 documents.

Times ONLY the repetition part (both gram tallies + distinct count),
fully evaluated via a sum-all aggregate. Variants:
  shipped   — prehash words, per-n gram hashes, two 5-field folds
  g2reuse   — 3-gram hashes chained FROM the 2-gram hash array
  packed    — g2reuse + fold counters packed into one long (3-field acc)
  fusedlong — ONE sort over (hash<<1|kind) longs, one 4-field packed fold
Run: python scripts/rep_tally_ab.py [reps]
"""
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from solana_event_stream_spark.operators.text_analysis import (  # noqa: E402
    _rep_gram_hashes, _run_length_tally, _word_hashes)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

def _MASK():
    return F.lit((1 << 21) - 1).cast("long")

SF_DIR = "/root/testdata/sf0.1"


def _g2(hw):
    s = F.size(hw)
    return F.when(s >= 2, F.zip_with(
        F.slice(hw, 1, s - 1), F.slice(hw, 2, s - 1),
        lambda a, b: F.xxhash64(a, b))) \
        .otherwise(F.array().cast("array<long>"))


def _g3_from_g2(g2, hw):
    # 3-gram hash = xxhash64(g2[i], w[i+2]): chain the already-built
    # 2-gram hash array instead of recomputing the (a,b) pair hash.
    s = F.size(hw)
    return F.when(s >= 3, F.zip_with(
        F.slice(g2, 1, s - 2), F.slice(hw, 3, s - 2),
        lambda h, c: F.xxhash64(h, c))) \
        .otherwise(F.array().cast("array<long>"))


def _packed_tally(grams_col):
    """struct(total, top, dup) via a 3-field fold: prev hash, run, and
    top/dup/total packed into ONE long (21 bits each)."""
    z = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("pk"))  # top<<42 | dup<<21 | total

    def step(acc, x):
        nr = F.when(x == acc["prev"], acc["run"] + 1) \
            .otherwise(F.lit(1).cast("long"))
        top = F.greatest(F.shiftright(acc["pk"], 42), nr)
        dup_inc = F.when(nr == 2, 2).when(nr > 2, 1).otherwise(0)
        dup = F.shiftright(acc["pk"], 21).bitwiseAND(_MASK()) + dup_inc
        tot = acc["pk"].bitwiseAND(_MASK()) + 1
        return F.struct(x.alias("prev"), nr.alias("run"),
                        (F.shiftleft(top, 42) + F.shiftleft(dup, 21)
                         + tot).alias("pk"))

    def finish(acc):
        tot = acc["pk"].bitwiseAND(_MASK())
        return F.when(tot > 0, F.struct(
            tot.alias("total"),
            F.shiftright(acc["pk"], 42).alias("top"),
            (F.shiftright(acc["pk"], 21)
             .bitwiseAND(_MASK())).alias("dup")))

    return F.aggregate(F.array_sort(grams_col), z, step, finish)


def _fused_long_tallies(g2, g3):
    """struct(t2, t3) from ONE sorted array of (hash<<1 | kind) longs,
    one fold with two packed counter fields routed by the kind bit."""
    tagged = F.concat(
        F.transform(g2, lambda h: F.shiftleft(h, 1)),
        F.transform(g3, lambda h: F.shiftleft(h, 1) + 1))
    z = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("pk2"),
        F.lit(0).cast("long").alias("pk3"))

    def step(acc, x):
        nr = F.when(x == acc["prev"], acc["run"] + 1) \
            .otherwise(F.lit(1).cast("long"))
        is2 = x.bitwiseAND(F.lit(1).cast("long")) == 0
        dup_inc = F.when(nr == 2, 2).when(nr > 2, 1).otherwise(0)

        def upd(pk):
            top = F.greatest(F.shiftright(pk, 42), nr)
            dup = F.shiftright(pk, 21).bitwiseAND(_MASK()) + dup_inc
            tot = pk.bitwiseAND(_MASK()) + 1
            return F.shiftleft(top, 42) + F.shiftleft(dup, 21) + tot

        return F.struct(
            x.alias("prev"), nr.alias("run"),
            F.when(is2, upd(acc["pk2"])).otherwise(acc["pk2"]).alias("pk2"),
            F.when(is2, acc["pk3"]).otherwise(upd(acc["pk3"])).alias("pk3"))

    def finish(acc):
        def unpack(pk):
            tot = pk.bitwiseAND(_MASK())
            return F.when(tot > 0, F.struct(
                tot.alias("total"),
                F.shiftright(pk, 42).alias("top"),
                (F.shiftright(pk, 21)
                 .bitwiseAND(_MASK())).alias("dup")))
        return F.struct(unpack(acc["pk2"]).alias("t2"),
                        unpack(acc["pk3"]).alias("t3"))

    return F.aggregate(F.array_sort(tagged), z, step, finish)


def base_frames(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    words = F.split(F.col("text"), " ")
    return docs, words


def v_shipped(spark):
    docs, words = base_frames(spark)
    hashed = docs.select("doc_id", _word_hashes(words).alias("hw"))
    hw = F.col("hw")
    return hashed.select(
        "doc_id", F.size(hw).alias("n_words"),
        F.size(F.array_distinct(hw)).alias("nd"),
        _run_length_tally(_rep_gram_hashes(hw, 2), "long").alias("t2"),
        _run_length_tally(_rep_gram_hashes(hw, 3), "long").alias("t3"))


def v_g2reuse(spark):
    docs, words = base_frames(spark)
    hashed = docs.select("doc_id", _word_hashes(words).alias("hw"))
    hw = F.col("hw")
    staged = hashed.select("doc_id", "hw", _g2(hw).alias("g2"))
    return staged.select(
        "doc_id", F.size("hw").alias("n_words"),
        F.size(F.array_distinct("hw")).alias("nd"),
        _run_length_tally(F.col("g2"), "long").alias("t2"),
        _run_length_tally(_g3_from_g2(F.col("g2"), F.col("hw")),
                          "long").alias("t3"))


def v_packed(spark):
    docs, words = base_frames(spark)
    hashed = docs.select("doc_id", _word_hashes(words).alias("hw"))
    hw = F.col("hw")
    staged = hashed.select("doc_id", "hw", _g2(hw).alias("g2"))
    return staged.select(
        "doc_id", F.size("hw").alias("n_words"),
        F.size(F.array_distinct("hw")).alias("nd"),
        _packed_tally(F.col("g2")).alias("t2"),
        _packed_tally(_g3_from_g2(F.col("g2"), F.col("hw")))
        .alias("t3"))


def v_fusedlong(spark):
    docs, words = base_frames(spark)
    hashed = docs.select("doc_id", _word_hashes(words).alias("hw"))
    hw = F.col("hw")
    staged = hashed.select("doc_id", "hw", _g2(hw).alias("g2"))
    fused = staged.select(
        "doc_id", F.size("hw").alias("n_words"),
        F.size(F.array_distinct("hw")).alias("nd"),
        _fused_long_tallies(F.col("g2"),
                            _g3_from_g2(F.col("g2"), F.col("hw")))
        .alias("ts"))
    return fused.select("doc_id", "n_words", "nd",
                        F.col("ts.t2").alias("t2"),
                        F.col("ts.t3").alias("t3"))


def force(df):
    return df.agg(F.sum(
        F.col("n_words") + F.col("nd")
        + F.coalesce(F.col("t2.total") + F.col("t2.top") + F.col("t2.dup"),
                     F.lit(0))
        + F.coalesce(F.col("t3.total") + F.col("t3.top") + F.col("t3.dup"),
                     F.lit(0)))).collect()[0][0]


def main():
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .appName("rep_tally_ab").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    variants = {"shipped": v_shipped, "g2reuse": v_g2reuse,
                "packed": v_packed, "fusedlong": v_fusedlong}
    checks = {n: force(fn(spark)) for n, fn in variants.items()}
    ref = checks["shipped"]
    for n, c in checks.items():
        assert c == ref, f"{n} checksum {c} != shipped {ref}"
    print(f"checksum parity OK: {ref}")
    times = {n: [] for n in variants}
    for r in range(REPS):
        for n, fn in variants.items():   # interleaved
            t0 = time.monotonic()
            force(fn(spark))
            times[n].append(time.monotonic() - t0)
    for n in variants:
        ts = sorted(times[n])
        med = ts[len(ts) // 2]
        print(f"{n:10s} med {med:.3f}s  min {ts[0]:.3f}s  "
              f"ratio-vs-shipped {med / sorted(times['shipped'])[len(ts) // 2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
