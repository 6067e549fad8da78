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

# --- round-5 surfaces: embedding stage + JPEG codec + incremental KG ---
import numpy as _np

from deduce_ray.ops.embed import HashingEncoder as _HE, embed_documents as _ed
import pyarrow as _pa2
import ray.data as _rd

_t = _pa2.table({
    "doc_id": _pa2.array([1, 2, 3], type=_pa2.int64()),
    "text": ["one two three", "three two one", "different words here"],
})
_emb = _ed(_rd.from_arrow(_t), dim=16).to_pandas().sort_values("doc_id")
assert list(_emb["doc_id"]) == [1, 2, 3]
assert _np.allclose(
    _np.asarray(_emb["embedding"].iloc[0]),
    _np.asarray(_emb["embedding"].iloc[1]),
), "word-permuted docs must embed identically"

from deduce_ray.ops.jpeg import decode_jpeg as _dj, encode_jpeg as _ej

_vals = _np.arange(6, dtype=_np.uint8).reshape(2, 3) * 40 + 5
_img = _np.kron(_vals, _np.ones((8, 8), dtype=_np.uint8))
assert _np.array_equal(_dj(_ej(_img, quality=100))[..., 0], _img), (
    "block-constant q100 JPEG must round-trip bit-exactly"
)
print("embed + jpeg legs: OK", flush=True)

# incremental KG: two analyze --state-dir batches == documented shape
import tempfile as _tf

_kgwork = _tf.mkdtemp(prefix="drive_smoke_kg_")
for _name, _rows in (
    ("b1", [(1, "zie 11112222 en 33334444 hier")]),
    ("b2", [(2, "weer 11112222 en 33334444 samen")]),
):
    os.makedirs(f"{_kgwork}/{_name}")
    _pq.write_table(
        _pa2.table({
            "doc_id": _pa2.array([r[0] for r in _rows], type=_pa2.int64()),
            "text": _pa2.array([r[1] for r in _rows]),
            "lang": _pa2.array(["nl"] * len(_rows)),
        }),
        f"{_kgwork}/{_name}/docs.parquet",
    )
_kgout = []
for _name in ("b1", "b2"):
    _r = subprocess.run(
        [sys.executable, "-m", "deduce_ray", "analyze",
         "--input", f"{_kgwork}/{_name}", "--state-dir", f"{_kgwork}/store",
         "--state-label", _name, "--enabled", "identifiers,identifier",
         "--top", "5", "--num-cpus", "2"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    assert _r.returncode == 0, _r.stderr[-2000:]
    _kgout.append(_json.loads(
        [ln for ln in _r.stdout.splitlines() if ln.startswith("{")][-1]
    ))
# the shared edge merged: both entities present after batch 2
assert _kgout[1]["entities"] == 2, _kgout
print(f"kg --state-dir legs: b1 {_kgout[0]['entities']} entities, "
      f"b2 merged {_kgout[1]['entities']}", flush=True)
shutil.rmtree(_kgwork, ignore_errors=True)
