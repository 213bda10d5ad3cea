"""Time run_frequency_pipeline only (perf bisect helper)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osm2gtfs_spark.plans.pipeline import run_frequency_pipeline
from osm2gtfs_spark.session import build_session
from osm2gtfs_spark.sources import docs as D

spark = build_session("bench-pipe")
spark.sparkContext.setLogLevel("ERROR")
docs = D.docs_df(spark, D.CitySpec(n_lines=1500, variants_per_line=2, stops_per_variant=12), n_partitions=32).cache()
docs.count()
t0 = time.time()
tables = run_frequency_pipeline(docs)
n = (tables.stop_times.count() + tables.stops.count() + tables.routes.count()
     + tables.trips.count() + tables.shapes.count() + tables.frequencies.count())
print(f"pipeline_sec={time.time()-t0:.2f} rows={n}")
spark.stop()
