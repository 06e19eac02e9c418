"""cProfile the driver-side build of one doc_neardup_serve lookup."""
import cProfile, io, os, pstats, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .appName("p3").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from mini_data_platform_spark.plans import llm
from mini_data_platform_spark.operators.resources import release_plan

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
which = sys.argv[2] if len(sys.argv) > 2 else "doc"
fn = llm.doc_neardup_serve if which == "doc" else llm.emb_neardup_serve
for _ in range(2):
    df = fn(spark, sf_dir); df.write.format("noop").mode("overwrite").save(); release_plan(df)

pr = cProfile.Profile()
t0 = time.perf_counter()
pr.enable()
df = fn(spark, sf_dir)
pr.disable()
t_build = time.perf_counter() - t0
t0 = time.perf_counter()
df.write.format("noop").mode("overwrite").save()
t_run = time.perf_counter() - t0
release_plan(df)
print(f"build={t_build:.3f}s run={t_run:.3f}s")
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(28)
print(s.getvalue())
spark.stop()
