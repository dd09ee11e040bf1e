import json, os, sys, time
sys.path.insert(0, "/root/repo")
cores = int(sys.argv[1])
os.sched_setaffinity(0, range(cores))
from pyspark.sql import functions as F
from osm_pt_validator_spark.session import ensure_py_files, get_spark
spark = get_spark(f"sh-{cores}", cores=cores, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).select(F.sum("id")).collect()
# pure JVM compute: codegen expressions, no shuffle
df = spark.range(0, 200_000_000, 1, numPartitions=64)
t0=time.time(); df.select((F.col("id")*2654435761%2**31).alias("h")).agg(F.sum("h")).collect(); t_cpu=time.time()-t0
# shuffle-heavy: groupBy high-cardinality
t0=time.time(); spark.range(0, 30_000_000, 1, numPartitions=64).groupBy((F.col("id")%3_000_000).alias("k")).count().agg(F.sum("count")).collect(); t_shuf=time.time()-t0
# collect_list struct shuffle (the automaton's input shape)
t0=time.time(); spark.range(0, 8_000_000, 1, numPartitions=64).select((F.col("id")%1_000_000).alias("k"), F.col("id").alias("v")).groupBy("k").agg(F.sort_array(F.collect_list(F.struct("v"))).alias("ms")).select(F.sum(F.size("ms"))).collect(); t_cl=time.time()-t0
print(json.dumps({"cores": cores, "t_cpu": round(t_cpu,2), "t_shuffle": round(t_shuf,2), "t_collect_list": round(t_cl,2)}))
spark.stop()
