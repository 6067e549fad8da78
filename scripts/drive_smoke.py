import importlib.util, ray, sys
ray.init(address="local", num_cpus=8, include_dashboard=False, log_to_driver=False)
spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
res = mod.entry()
print("entry() rows from /tmp CWD:", res.count(), flush=True)

import ray.data
big = "woordje " * 400_000 + "Contact via test@voorbeeld.nl. "
rows = [{"repo":"org/r","path":"big.txt","commit":"f"*40,"lang":"nl","content":big}]
from deduce_ray.rayops.annotate import extract_triples
got = extract_triples(ray.data.from_items(rows), lexicon_ref=mod._lexicon_ref()).take_all()
preds = sorted(set(r["pred"] for r in got))
trunc = [r for r in got if r["pred"]=="_truncated"]
print("big-doc preds:", preds, "| truncated flag obj:", trunc[0]["obj"] if trunc else None, flush=True)

red = mod.queries()["kg_redacted_sqlpreds"]("/root/testdata/sf0.001").take(1)
print("redacted sample:", red[0]["obj"][-110:], flush=True)

from deduce_ray import DeduceEngine
eng = DeduceEngine()
import time; t0=time.time()
doc = eng.deidentify("gezien door F. " + "Jansen " * 2500)
print(f"long-chain: {len(doc.annotations)} annotations in {time.time()-t0:.1f}s, no recursion error", flush=True)
ray.shutdown()
