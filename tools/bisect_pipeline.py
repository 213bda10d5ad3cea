"""Per-stage timing bisect for run_frequency_pipeline (perf diagnosis).

Times each pipeline stage to materialization in dependency order so the
cache-warm cost lands on the stage that creates the data, mirroring the
sequential-count path of tools/bench_pipeline_only.py.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from osm2gtfs_spark.plans import gtfs
from osm2gtfs_spark.session import build_session
from osm2gtfs_spark.sources import docs as D

spark = build_session("bench-bisect")
spark.sparkContext.setLogLevel("ERROR")
docs = D.docs_df(spark, D.CitySpec(n_lines=1500, variants_per_line=2, stops_per_variant=12), n_partitions=32).cache()
docs.count()

T = {}
def clock(name, fn):
    t0 = time.time()
    out = fn()
    T[name] = round(time.time() - t0, 2)
    print(f"{name:24s} {T[name]:6.2f}s")
    return out

t_all = time.time()
nodes = D.decode_nodes(docs).cache()
ways = D.decode_ways(docs).cache()
relations = D.decode_relations(docs).cache()
clock("decode_nodes", nodes.count)
clock("decode_ways", ways.count)
clock("decode_relations", relations.count)

stops = clock("build_stops", lambda: gtfs.build_stops(nodes, ways, "stop"))
clock("  stops.count", stops.count)
stations, parent_map = gtfs.build_stations(relations, stops)
clock("  stations.count", stations.count)
lines, itineraries = gtfs.build_lines(relations)
clock("  lines.count", lines.count)
itin_stops = gtfs.itinerary_stops(relations)
clock("  itin_stops.count", itin_stops.count)
shapes = gtfs.build_shapes(relations, ways, nodes)
clock("  shapes.count", shapes.count)
trips_full = gtfs.build_trips(lines, itineraries).cache()
clock("  trips_full.count", trips_full.count)
freq = gtfs.build_frequencies(trips_full)
clock("  frequencies.count", freq.count)
st = gtfs.build_stop_times(trips_full, itin_stops).cache()
clock("  stop_times.count", st.count)
stops_final = gtfs.prune_unused_stops(stops, st).join(F.broadcast(parent_map), "stop_key", "left")
clock("  stops_final.count", stops_final.count)
routes_final = gtfs.prune_unused_routes(lines, trips_full)
clock("  routes_final.count", routes_final.count)
print(f"TOTAL {time.time()-t_all:.2f}s")
spark.stop()
