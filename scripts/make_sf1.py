#!/usr/bin/env python3
"""Synthesize an sf1-scale bench dataset from sf0.1 (driver ships no sf1).

10 structure-preserving replicas of every sf0.1 table:

- documents: replica k interleaves a replica-tag token after every 2nd
  token ("t1 t2 rKgNN t3 t4 rKgMM ..."; replica 0 is the raw corpus).
  The tag is CONTENT-ANCHORED: its suffix is a hash of the two
  preceding tokens modulo 64 (round-12 fix). Within a replica the
  original near-dup structure survives (near-identical token runs get
  identical tags wherever their local context matches — alignment is
  by content, not by global position, so length-changing edits only
  perturb tags next to the edit, exactly like shingles themselves),
  while ANY cross-replica 3-shingle contains differing tags ->
  cross-replica Jaccard is 0. Net: near-dup pairs, spans, and LSH
  candidates scale linearly - the right load for slope measurement,
  with no artificial 10-way exact-dup cliques.

  Why not one constant tag per replica (the r11 scheme): a single token
  carrying 1/3 of every doc's token mass (a) votes a common heavy
  direction into every SimHash in the replica, homogenizing signatures
  and exploding banding candidates (d_simhash read 29.7x), and (b)
  collapses every tag-containing 3-gram to an effective 2-gram (the tag
  contributes no entropy), inflating within-replica gram collisions for
  the winnow/jaccard truth sides (d_winnow_recall read 12.2x). With 64
  content-anchored variants each tag is ~0.5% mass (no common SimHash
  direction) and a tag-bearing gram keeps >= 3 tokens of content
  entropy (the tag hash covers the two tokens BEFORE the gram's first
  token, widening context instead of narrowing it).
- embeddings: replica k applies one replica-specific coordinate
  permutation to every vector. Norms and all WITHIN-replica cosines are
  invariant; cross-replica cosines collapse to noise (checked below to
  sit under the 0.44 gate threshold).
- events: replica k offsets user_id / event_id; timestamps unchanged, so
  per-user session structure replicates.
- lineitem/orders/customer/supplier/part: key-offset replicas with FK
  consistency (custkey/orderkey/partkey/suppkey all offset by the same
  replica stride). region/nation are dimensions - copied as-is.

Deterministic (seed fixed). Output: /tmp/graft_sf1/<table>.parquet
"""
import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def read(name):
    return con.execute(f"SELECT * FROM '{SRC}/{name}.parquet'").arrow()


def write(name, table):
    pq.write_table(table, f"{DST}/{name}.parquet")
    print(f"  {name}: {table.num_rows} rows")


# dimensions: verbatim
for t in ["region", "nation"]:
    write(t, read(t))

# documents: tag-interleaved replicas (content-anchored cycling tags —
# see module docstring; FNV-1a so the anchor is deterministic and cheap)
def fnv64(s):
    h = 0xcbf29ce484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
    return h


docs = read("documents").to_pydict()
M = max(docs["doc_id"]) + 1
out = {k: [] for k in docs}
for k in range(REPLICAS):
    for i in range(len(docs["doc_id"])):
        if k == 0:
            text = docs["text"][i]
        else:
            toks = docs["text"][i].split(" ")
            woven = []
            for j, t in enumerate(toks):
                woven.append(t)
                if j % 2 == 1:
                    anchor = fnv64(toks[j - 1] + "\x1f" + t) % 64
                    woven.append(f"r{k}g{anchor}")
            text = " ".join(woven)
        out["doc_id"].append(docs["doc_id"][i] + k * M)
        out["text"].append(text)
        out["lang"].append(docs["lang"][i])
        out["source"].append(docs["source"][i])
        out["n_chars"].append(len(text))
write("documents", pa.table(out))

# embeddings: replica-specific signed coordinate permutation (an
# orthogonal transform: all WITHIN-replica cosines/norms are invariant;
# the sign flips kill the cluster-mean alignment a bare permutation
# leaves behind, so cross-replica cosines collapse to noise)
emb = read("embeddings").to_pydict()
dim = len(emb["embedding"][0])
EM = max(emb["vec_id"]) + 1
rng = np.random.RandomState(42)
perms = [np.arange(dim)] + [rng.permutation(dim) for _ in range(REPLICAS - 1)]
signs = [np.ones(dim, dtype=np.float32)] + [
    rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
    for _ in range(REPLICAS - 1)]
vecs = np.array(emb["embedding"], dtype=np.float32)
eout = {"vec_id": [], "embedding": [], "label": []}
for k in range(REPLICAS):
    pv = (vecs * signs[k])[:, perms[k]]
    eout["vec_id"].extend([v + k * EM for v in emb["vec_id"]])
    eout["embedding"].extend([row.tolist() for row in pv])
    eout["label"].extend(emb["label"])
write("embeddings", pa.table(
    {"vec_id": pa.array(eout["vec_id"], pa.int64()),
     "embedding": pa.array(eout["embedding"], pa.list_(pa.float32())),
     "label": pa.array(eout["label"])}))

# sanity: the source embeddings are (near-)isotropic gaussians, so
# cross-replica cosines under a signed permutation must follow the SAME
# distribution as natural unrelated pairs — i.e. the scaled corpus's
# pair statistics are the statistics the driver's own generator would
# produce at 10x rows (threshold-pair counts grow ~quadratically for
# iid vectors; that is the data model, not an artifact). Probe: the
# cross-replica p99.9 |cos| may not exceed the natural p99.9 by more
# than noise.
sample = vecs[:300]
nrm = sample / np.linalg.norm(sample, axis=1, keepdims=True)
nat = np.abs(nrm @ nrm.T)
np.fill_diagonal(nat, 0)
natural_p999 = float(np.percentile(nat, 99.9))
r1 = (sample * signs[1])[:, perms[1]]
r1 /= np.linalg.norm(r1, axis=1, keepdims=True)
cross = np.abs(nrm @ r1.T)
cross_p999 = float(np.percentile(cross, 99.9))
print(f"  |cos| p99.9 natural={natural_p999:.4f} cross-replica={cross_p999:.4f}")
assert cross_p999 < natural_p999 * 1.25, \
    "cross-replica similarity exceeds the natural pair distribution"

# events: user/event-offset replicas, timestamps unchanged
ev = con.execute(f"SELECT * FROM '{SRC}/events.parquet'").arrow()
names = ev.column_names
print(f"  events columns: {names}")
evd = ev.to_pydict()
offsets = {c: (max(evd[c]) + 1) for c in names
           if c.endswith("_id") and isinstance(evd[c][0], int)}
eo = {c: [] for c in names}
for k in range(REPLICAS):
    for c in names:
        if c in offsets:
            eo[c].extend([v + k * offsets[c] for v in evd[c]])
        else:
            eo[c].extend(evd[c])
write("events", pa.table(
    {c: pa.array(eo[c], type=ev.schema.field(c).type) for c in names}))

# relational facts: FK-consistent key-offset replicas
def offset_cols(name, cols):
    t = read(name).to_pydict()
    sch = read(name).schema
    strides = {}
    for c in cols:
        strides[c] = max(t[c]) + 1
    o = {c: [] for c in t}
    for k in range(REPLICAS):
        for c in t:
            if c in cols:
                o[c].extend([v + k * strides[c] for v in t[c]])
            else:
                o[c].extend(t[c])
    return pa.table({c: pa.array(o[c], type=sch.field(c).type) for c in t}), strides


# strides must MATCH across tables for FK consistency: compute each
# key's stride from its home table and reuse on referencing tables
cust = read("customer").to_pydict(); cstride = max(cust["c_custkey"]) + 1
supp = read("supplier").to_pydict(); sstride = max(supp["s_suppkey"]) + 1
part = read("part").to_pydict(); pstride = max(part["p_partkey"]) + 1
orders = read("orders").to_pydict(); ostride = max(orders["o_orderkey"]) + 1


def replicate(name, data, keymap):
    sch = read(name).schema
    o = {c: [] for c in data}
    for k in range(REPLICAS):
        for c in data:
            if c in keymap:
                o[c].extend([v + k * keymap[c] for v in data[c]])
            else:
                o[c].extend(data[c])
    write(name, pa.table({c: pa.array(o[c], type=sch.field(c).type) for c in data}))


replicate("customer", cust, {"c_custkey": cstride})
replicate("supplier", supp, {"s_suppkey": sstride})
replicate("part", part, {"p_partkey": pstride})
replicate("orders", orders, {"o_orderkey": ostride, "o_custkey": cstride})
li = read("lineitem").to_pydict()
replicate("lineitem", li, {"l_orderkey": ostride, "l_partkey": pstride,
                           "l_suppkey": sstride})
print("done:", DST)
