"""Skew-hostile q9-shape wall-time study (VERDICT r8 item 5): the same
composite-key fact-fact SMJ + rollup at sf1-like volume (6M fact rows,
realistic row payload carried through the shuffle) under (a) uniform
keys, (b) one 95%-hot (partkey,suppkey) pair with AQE skew-join ON,
(c) the same hot pair with the split disabled. Thresholds model a
cluster where one shuffle partition exceeds an executor's budget
(1MB threshold : ~40MB hot partition = the 256MB : ~10GB ratio of a
real 1000-executor shuffle)."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.driver.memory", "12g")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
N = 6_000_000

def fact(skewed):
    if skewed:
        pk = F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 1000)
        sk = F.when(F.col("id") % 20 != 0, F.lit(3)).otherwise(F.col("id") % 10)
    else:
        pk, sk = F.col("id") % 1000, F.col("id") % 10
    return spark.range(N).select(
        pk.alias("l_partkey"), sk.alias("l_suppkey"),
        (F.col("id") % 50).cast("long").alias("l_quantity"),
        F.concat(F.lit("pad_pad_pad_pad_pad_"), F.col("id")).alias("pad"))

ps = (spark.range(1000).select(F.col("id").alias("ps_partkey"))
    .crossJoin(spark.range(10).select(F.col("id").alias("ps_suppkey")))
    .select("ps_partkey","ps_suppkey",
            (F.col("ps_partkey")*10+F.col("ps_suppkey")).cast("long").alias("ps_supplycost_cents")))

def build(skewed):
    # fresh lineage per sample: re-collecting the SAME DataFrame reuses
    # the previous execution's shuffle files and times only the reduce
    li = fact(skewed)
    j = li.hint("merge").join(ps, (li.l_partkey==ps.ps_partkey)&(li.l_suppkey==ps.ps_suppkey))
    return j.groupBy("l_suppkey").agg(
        F.sum(F.col("l_quantity")*F.col("ps_supplycost_cents")).alias("cost"),
        F.count(F.lit(1)).alias("n"),
        F.max(F.length("pad")).alias("padlen"))

def run(skewed, skew_on):
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    best, split, rows = float("inf"), False, None
    for _ in range(3):
        q = build(skewed)
        t0 = time.perf_counter()
        rows = q.collect()
        best = min(best, time.perf_counter() - t0)
        split = split or ("skew=true" in q._jdf.queryExecution().executedPlan().toString())
    return round(best, 2), split, {r.l_suppkey: (r.cost, r.n) for r in rows}

res = {}
for label, sk, on in [("uniform", False, True),
                      ("hot95_split_on", True, True),
                      ("hot95_split_off", True, False)]:
    sec, split, rows = run(sk, on)
    res[label] = (sec, split)
    print(f"{label}: best_sec={sec} skew_split={split}", flush=True)
# exactness: split on/off must agree
a = run(True, True); b = run(True, False)
print("split on/off results identical:", a[2] == b[2])
spark.stop()
