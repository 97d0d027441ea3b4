"""Engine-independent cluster scaling control: pure-JVM md5 burn
(zero shuffle, zero scan, zero Python) at a given spark.cores.max on
the live standalone master - the host ceiling any embarrassingly
parallel job gets at that executor pairing.

Usage: python tools/cluster_control.py <cores_max>
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from blackedge_ocr_spark.session import build_session
import pyspark.sql.functions as F

cores = int(sys.argv[1])
N = 120_000_000
spark = build_session(
    master="spark://127.0.0.1:7077",
    app_name=f"control-{cores}",
    shuffle_partitions=2 * cores,
    extra_conf={"spark.cores.max": str(cores),
                "spark.executor.cores": "2",
                "spark.executor.memory": "4g"},
)
df = spark.range(0, N, 1, 8 * cores).select(
    F.md5(F.col("id").cast("string")).alias("h"))
df.limit(1000).write.format("noop").mode("overwrite").save()  # warm
t0 = time.time()
df.write.format("noop").mode("overwrite").save()
print(json.dumps({"cores": cores, "control": "md5_burn",
                  "sec": round(time.time() - t0, 3), "n": N}))
spark.stop()
