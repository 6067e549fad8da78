"""Deduplication over document tables, Ray-Data-first.

All variants follow the same scale shape:

  1. per-batch signature computation (stateless map_batches, no shuffle);
  2. flat_map signatures to bucket keys (band hash / prefix);
  3. ONE hash-shuffle groupby on the bucket key;
  4. in-group verification (exact compare / Jaccard / Hamming) emitting
     either survivors or near-duplicate pairs.

Hashing is md5-based and seed-free, so results are deterministic across
processes and cluster sizes.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Hash-partition + per-group first: one row per distinct text with the
    surviving (minimum) id and the duplicate count."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return pa.table(
            {
                "content_hash": pa.array(
                    [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
                ),
                id_col: batch.column(id_col),
            }
        )

    def pick_first(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("content_hash", as_index=False)
            .agg(keep_id=(id_col, "min"), n_dupes=(id_col, "count"))
        )

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")
    # local combiner then one shuffle on the hash
    return hashed.map_batches(
        lambda df: pick_first(df), batch_format="pandas"
    ).groupby("content_hash").map_groups(
        lambda df: df.groupby("content_hash", as_index=False).agg(
            keep_id=("keep_id", "min"), n_dupes=("n_dupes", "sum")
        ),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------


def _stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def word_shingles(text: str, k: int = 3) -> set[int]:
    words = text.split()
    if not words:
        return set()
    if len(words) < k:
        return {_stable_hash64(" ".join(words))}
    return {
        _stable_hash64(" ".join(words[i : i + k]))
        for i in range(len(words) - k + 1)
    }


def _minhash_params(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    # deterministic a/b parameters derived from md5, no RNG state
    a = np.array(
        [_stable_hash64(f"minhash-a-{i}") | 1 for i in range(n_perm)],
        dtype=np.uint64,
    )
    b = np.array(
        [_stable_hash64(f"minhash-b-{i}") for i in range(n_perm)],
        dtype=np.uint64,
    )
    return a, b


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Min over (a*x + b) mod 2^64 per permutation — uint64 wraparound is a
    deterministic mixing permutation for odd a, vectorized over shingles."""
    if not shingles:
        return np.zeros(len(a), dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    prod = a[:, None] * x[None, :] + b[:, None]
    return prod.min(axis=1)


def jaccard(s1: set[int], s2: set[int]) -> float:
    if not s1 and not s2:
        return 1.0
    inter = len(s1 & s2)
    return inter / (len(s1) + len(s2) - inter)


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_perm: int = 64,
    bands: int = 32,
    threshold: float = 0.6,
):
    """MinHash+LSH near-duplicate pairs with exact Jaccard verification.

    Default banding 32x2 puts the S-curve knee near J~0.2, so candidate
    recall at J>=0.5 is effectively 1; the exact in-bucket Jaccard check
    removes the extra candidates.

    shingle -> minhash -> band -> bucket groupby -> in-bucket verify.
    Shingle sets ride along into the bucket groups so verification happens
    in-group (no second join); pairs are deduplicated across bands by a
    final distinct on (id_a, id_b).

    Scale note: carrying shingles in every band row multiplies shuffle
    volume by ``bands``.  At petabyte scale, switch verification to the
    signature-agreement estimate (|sig_a == sig_b| / n_perm, already
    shuffled at fixed 8*n_perm bytes/row) or run a second join against a
    (doc_id -> shingles) side table; both trade exactness of the reported
    Jaccard for constant-size shuffle rows.
    """
    rows_per_band = n_perm // bands
    a, b = _minhash_params(n_perm)
    n_shards = 256  # shuffle key granularity: most band-buckets are global
    # singletons, so grouping directly by bucket would launch one task per
    # bucket; sharding keeps it to <= n_shards group tasks, with the
    # per-bucket work vectorized in pandas inside each shard.

    def signatures(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out = {"shard": [], "bucket": [], id_col: [], "shingles": []}
        for i, t in zip(ids, texts):
            sh = word_shingles(t or "", k)
            sig = minhash_signature(sh, a, b)
            sh_list = list(sh)
            for band in range(bands):
                band_slice = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bucket = hashlib.md5(
                    struct.pack("<i", band) + band_slice.tobytes()
                ).hexdigest()[:16]
                out["shard"].append(int(bucket[:4], 16) % n_shards)
                out["bucket"].append(bucket)
                out[id_col].append(i)
                out["shingles"].append(sh_list)
        return pa.table(
            {
                "shard": pa.array(out["shard"], type=pa.int32()),
                "bucket": pa.array(out["bucket"]),
                id_col: pa.array(out[id_col], type=pa.int64()),
                "shingles": pa.array(out["shingles"], type=pa.list_(pa.uint64())),
            }
        )

    def verify_shard(df: pd.DataFrame) -> pd.DataFrame:
        pairs: dict[tuple[int, int], float] = {}
        shingle_cache: dict[int, set] = {}
        sizes = df.groupby("bucket")[id_col].nunique()
        hot_buckets = set(sizes[sizes > 1].index)
        if hot_buckets:
            sub = df[df["bucket"].isin(hot_buckets)]
            for _, group in sub.groupby("bucket"):
                docs = group.drop_duplicates(subset=[id_col])
                ids = docs[id_col].astype("int64").tolist()
                if len(ids) < 2:
                    continue
                for doc_id, shingles in zip(ids, docs["shingles"]):
                    if doc_id not in shingle_cache:
                        shingle_cache[doc_id] = set(int(x) for x in shingles)
                ids.sort()
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        key = (ids[i], ids[j])
                        if key in pairs:
                            continue
                        sim = jaccard(shingle_cache[ids[i]], shingle_cache[ids[j]])
                        if sim >= threshold:
                            pairs[key] = round(sim, 6)
                        else:
                            pairs[key] = -1.0  # remember rejection
        rows = [
            {"id_a": k[0], "id_b": k[1], "jaccard": v}
            for k, v in pairs.items()
            if v >= 0
        ]
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])

    sigs = ds.map_batches(signatures, batch_format="pyarrow")
    pairs = sigs.groupby("shard").map_groups(verify_shard, batch_format="pandas")
    # drop duplicate pairs found via buckets in different shards
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda df: df.head(1), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# connected components over near-dup pairs
# ---------------------------------------------------------------------------


def neardup_clusters(
    pairs_ds,
    nodes_ds=None,
    rounds: int = 4,
    driver_threshold: int = 1_000_000,
):
    """Cluster near-duplicate pairs into components.

    When the candidate pair set is provably small (<= driver_threshold,
    checked with a cheap count), collapse it with a driver-side union-find
    — near-dup pair sets are tiny relative to the corpus, and each
    distributed round costs two full shuffles.  Otherwise run iterative
    min-label propagation (each round: every node broadcasts its label to
    its neighbours via one groupby, then takes the min; ``rounds`` bounds
    the longest chain resolved at 2^rounds hops).

    pairs_ds: rows with id_a/id_b.  nodes_ds: optional rows with doc_id for
    singleton nodes.  Returns (doc_id, cluster_id) with cluster_id = min
    doc id in the component.
    """
    import ray.data

    if driver_threshold and pairs_ds.count() <= driver_threshold:
        pairs = pairs_ds.select_columns(["id_a", "id_b"]).take_all()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.setdefault(root, root) != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for row in pairs:
            ra, rb = find(int(row["id_a"])), find(int(row["id_b"]))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        if nodes_ds is not None:
            for row in nodes_ds.select_columns(["doc_id"]).take_all():
                find(int(row["doc_id"]))
        out = pd.DataFrame(
            sorted((node, find(node)) for node in parent),
            columns=["doc_id", "cluster_id"],
        )
        return ray.data.from_pandas(out)

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_pylist()
        b = batch.column("id_b").to_pylist()
        return pa.table(
            {
                "node": pa.array(a + b, type=pa.int64()),
                "peer": pa.array(b + a, type=pa.int64()),
            }
        )

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow")

    def to_self(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        return pa.table(
            {"node": ids, "peer": ids},
            schema=pa.schema([("node", pa.int64()), ("peer", pa.int64())]),
        )

    if nodes_ds is not None:
        edges = edges.union(
            nodes_ds.map_batches(to_self, batch_format="pyarrow")
        )

    # labels start as each node's own id (derived from the edge list)
    labels = edges.map_batches(
        lambda t: pa.table(
            {"node": t.column("node"), "label": t.column("node")}
        ),
        batch_format="pyarrow",
    ).groupby("node").map_groups(
        lambda df: df.head(1), batch_format="pandas"
    )

    def _with_peer(labels_batch: pa.Table) -> pa.Table:
        n = labels_batch.num_rows
        return pa.table(
            {
                "node": labels_batch.column("node"),
                "label": pc.cast(labels_batch.column("label"), pa.int64()),
                "peer": pa.nulls(n, type=pa.int64()),
            }
        )

    def _with_label(edges_batch: pa.Table) -> pa.Table:
        n = edges_batch.num_rows
        return pa.table(
            {
                "node": edges_batch.column("node"),
                "label": pa.nulls(n, type=pa.int64()),
                "peer": edges_batch.column("peer"),
            }
        )

    for _ in range(rounds):
        tagged = labels.map_batches(_with_peer, batch_format="pyarrow").union(
            edges.map_batches(_with_label, batch_format="pyarrow")
        )

        def send(df: pd.DataFrame) -> pd.DataFrame:
            label = int(df["label"].dropna().min())
            peers = df["peer"].dropna().astype("int64")
            out = pd.DataFrame(
                {
                    "node": pd.concat(
                        [peers, df["node"].iloc[:1].astype("int64")],
                        ignore_index=True,
                    ),
                }
            )
            out["label"] = label
            return out

        messages = tagged.groupby("node").map_groups(send, batch_format="pandas")
        labels = messages.groupby("node").map_groups(
            lambda df: df.groupby("node", as_index=False).agg(
                label=("label", "min")
            ),
            batch_format="pandas",
        )

    return labels.map_batches(
        lambda df: df.rename(columns={"node": "doc_id", "label": "cluster_id"}),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for word in text.split():
        h = _stable_hash64(word)
        bits = np.unpackbits(
            np.frombuffer(struct.pack(">Q", h), dtype=np.uint8)
        ).astype(np.int64)
        acc += bits * 2 - 1
    return int(
        np.packbits((acc > 0).astype(np.uint8)).view(">u8")[0]
    )


def simhash_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
):
    """SimHash near-dup pairs: 4x16-bit band bucketing guarantees recall for
    Hamming distance <= 3; in-bucket exact Hamming verification."""

    n_shards = 256

    def signatures(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out = {"shard": [], "bucket": [], id_col: [], "simhash": []}
        for i, t in zip(ids, texts):
            h = simhash64(t or "")
            for band in range(4):
                chunk = (h >> (band * 16)) & 0xFFFF
                out["shard"].append((band * 65536 + chunk) % n_shards)
                out["bucket"].append(f"{band}:{chunk:04x}")
                out[id_col].append(i)
                out["simhash"].append(h)
        return pa.table(
            {
                "shard": pa.array(out["shard"], type=pa.int32()),
                "bucket": pa.array(out["bucket"]),
                id_col: pa.array(out[id_col], type=pa.int64()),
                "simhash": pa.array(out["simhash"], type=pa.uint64()),
            }
        )

    def verify_shard(df: pd.DataFrame) -> pd.DataFrame:
        pairs: dict[tuple[int, int], int] = {}
        sizes = df.groupby("bucket")[id_col].nunique()
        for bucket in sizes[sizes > 1].index:
            docs = df[df["bucket"] == bucket].drop_duplicates(subset=[id_col])
            items = sorted(
                zip(docs[id_col].astype(int), docs["simhash"].astype(np.uint64))
            )
            for i in range(len(items)):
                for j in range(i + 1, len(items)):
                    key = (items[i][0], items[j][0])
                    if key in pairs:
                        continue
                    dist = int(bin(int(items[i][1]) ^ int(items[j][1])).count("1"))
                    pairs[key] = dist
        rows = [
            {"id_a": k[0], "id_b": k[1], "hamming": v}
            for k, v in pairs.items()
            if v <= max_hamming
        ]
        return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])

    sigs = ds.map_batches(signatures, batch_format="pyarrow")
    pairs = sigs.groupby("shard").map_groups(verify_shard, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda df: df.head(1), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    ds_embeddings,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.97,
    n_planes: int = 12,
):
    """Cosine near-duplicates via random-hyperplane LSH buckets + exact
    in-bucket verification.  Hyperplanes are seeded deterministically."""
    def signatures(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        planes = np.random.default_rng(12345).standard_normal(
            (vecs.shape[1], n_planes)
        )
        bits = (vecs @ planes) > 0
        buckets = [
            "".join("1" if x else "0" for x in row) for row in bits
        ]
        return pa.table(
            {
                "bucket": pa.array(buckets),
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
            }
        )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        docs = df.drop_duplicates(subset=[id_col]).sort_values(id_col)
        if len(docs) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
        ids = docs[id_col].astype(int).to_numpy()
        mat = np.asarray(list(docs[vec_col]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        sims = unit @ unit.T
        pairs = []
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= threshold:
                    pairs.append(
                        {
                            "id_a": int(ids[i]),
                            "id_b": int(ids[j]),
                            "cosine": round(float(sims[i, j]), 6),
                        }
                    )
        return pd.DataFrame(pairs, columns=["id_a", "id_b", "cosine"])

    sigs = ds_embeddings.map_batches(signatures, batch_format="pyarrow")
    return sigs.groupby("bucket").map_groups(verify, batch_format="pandas")
