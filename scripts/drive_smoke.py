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

# data-prep funnel + incremental stores: two overlapping mini-ingests
import shutil, tempfile
from deduce_ray.ops.funnel import prep_corpus
from deduce_ray.state import incremental_dedup, incremental_neardup
work = tempfile.mkdtemp(prefix="drive_smoke_state_")
long1 = " ".join(f"woord{i}" for i in range(60))
long2 = " ".join(f"ander{i}" for i in range(60))
b1 = ray.data.from_items([{"doc_id": 1, "text": long1}, {"doc_id": 2, "text": long2}])
from deduce_ray.ops.dedup import simhash64
near2 = next(  # deterministic suffix within 3 signature bits of long2
    c for c in (f"{long2} tail{i}" for i in range(500))
    if bin(simhash64(long2) ^ simhash64(c)).count("1") <= 3
)
b2 = ray.data.from_items([
    {"doc_id": 10, "text": long1},   # exact repeat -> exact store drops
    {"doc_id": 11, "text": near2},   # near repeat -> simhash store drops
    {"doc_id": 12, "text": " ".join(f"vers{i}" for i in range(60))},
])
for label, batch in (("b1", b1), ("b2", b2)):
    out = prep_corpus(batch, min_chars=10, minhash_threshold=None)
    out = incremental_dedup(out, f"{work}/exact", label)
    out = incremental_neardup(out, f"{work}/near", label)
    print(f"prep+stores {label}: survivors {sorted(r['doc_id'] for r in out.take_all())}", flush=True)
shutil.rmtree(work, ignore_errors=True)
ray.shutdown()

# prep --resume CLI end-to-end (own subprocess Ray, so after shutdown):
# run, crash-simulate (drop one bucket's manifest + data), resume
import json as _json, os, subprocess
import pyarrow as _pa, pyarrow.parquet as _pq
work = tempfile.mkdtemp(prefix="drive_smoke_resume_")
corpus = f"{work}/corpus.parquet"
docs = [" ".join(f"tok{i}w{j}" for j in range(30)) for i in range(40)]
_pq.write_table(
    _pa.table({"doc_id": _pa.array(range(80), type=_pa.int64()),
               "text": [docs[i % 40] for i in range(80)]}),
    corpus,
)
out_dir = f"{work}/out"
cli = [sys.executable, "-m", "deduce_ray", "prep", "--input", corpus,
       "--output", out_dir, "--resume", "--resume-buckets", "4",
       "--minhash-threshold", "0", "--num-cpus", "4"]
env = {**os.environ, "RAY_ADDRESS": "local"}
r1 = subprocess.run(cli, capture_output=True, text=True, env=env, cwd="/root/repo")
assert r1.returncode == 0, r1.stderr[-2000:]
s1 = _json.loads(r1.stdout.strip().splitlines()[-1])
mf = sorted(__import__("pathlib").Path(out_dir, "_manifests").glob("part-*.json"))[0]
bucket = _json.loads(mf.read_text())["bucket"]
mf.unlink(); os.unlink(f"{out_dir}/part-{bucket:05d}.parquet")
r2 = subprocess.run(cli, capture_output=True, text=True, env=env, cwd="/root/repo")
assert r2.returncode == 0, r2.stderr[-2000:]
s2 = _json.loads(r2.stdout.strip().splitlines()[-1])
assert s2["buckets_skipped"] == s1["buckets_written"] - 1, (s1, s2)
assert s2["survivors"] == s1["survivors"] == 40, (s1, s2)
print(f"prep --resume CLI: run1 {s1} | resumed {s2}", flush=True)
shutil.rmtree(work, ignore_errors=True)
