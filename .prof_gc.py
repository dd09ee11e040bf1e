import json, os, sys, time
sys.path.insert(0, "/root/repo")
cores = int(sys.argv[1])
os.sched_setaffinity(0, range(cores))
os.environ["SPARK_DRIVER_MEMORY"] = sys.argv[2] if len(sys.argv) > 2 else "16g"
from pyspark.sql import functions as F
import bench
from osm_pt_validator_spark.session import ensure_py_files, get_spark
spark = get_spark(f"gc-{cores}", cores=cores, shuffle_partitions=64,
                  extra_conf={"spark.driver.extraJavaOptions": "-Xlog:gc:/tmp/gc_%s.log" % cores})
ensure_py_files(spark)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).select(F.sum("id")).collect()
bench._N_RELS = 112500
bench.bench_validation(spark, "")
bench._N_RELS = 900000
t0 = time.time(); bench.bench_validation(spark, ""); wall = time.time() - t0
print(json.dumps({"cores": cores, "wall": round(wall, 2)}))
spark.stop()
