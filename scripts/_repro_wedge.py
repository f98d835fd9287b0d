"""Minimal repro hunt for the 8-CPU online_serving wedge (debug scratch).
Usage: python scripts/_repro_wedge.py img3 asof_core asof_timed ... srv"""
import sys, time
sys.path.insert(0, "/root/repo")
import ray, ray.data
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
ray.data.DataContext.get_current().enable_progress_bars = False
from raywin.pipelines import catalog
from raywin.pipelines.images import image_feature_backfill
SF = "/root/testdata/sf0.01"
NAMES = {
    "asof_core": catalog.asof_core, "asof_timed": catalog.asof_timed,
    "join_enrich": catalog.join_enrich, "lag_lead": catalog.lag_lead_events,
    "sessionize": catalog.sessionize_30m, "q1": catalog.q1_pricing_summary,
    "minhash": catalog.minhash_clusters_docs, "ann": catalog.ann_cosine_topk,
    "srv": catalog.online_serving,
}
for spec in sys.argv[1:]:
    name = spec.rstrip("0123456789")
    reps = int(spec[len(name):] or "1")
    for r in range(reps):
        t0 = time.time()
        if name == "img":
            n = image_feature_backfill("/tmp/verify_img").count()
        else:
            n = NAMES[name](SF).count()
        print(f"STEP {name}[{r}] rows={n} secs={time.time()-t0:.1f}", flush=True)
print("DONE", flush=True)
ray.shutdown()
