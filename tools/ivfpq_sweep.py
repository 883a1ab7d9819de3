"""IVF-PQ recall sweep (rounds 11-12, verdict ask #2): measure
recall@top-k of the q_similarity_ivfpq_search pipeline against the
exact top-k, across nprobe / ADC-shortlist / codebook granularity, on
the sf embeddings table. Numpy replica of the exact pipeline the
catalog query runs (label-mean coarse centroids, cosine cell
assignment, label-seeded per-subspace codebooks, ADC shortlist, exact
cosine rerank) — the snap-rounding the two engines share is a
hash-stability device, not a ranking change, so the sweep's recall
numbers transfer directly.

    PYTHONPATH=/root/repo python tools/ivfpq_sweep.py [sf_dir]

Emits one line per configuration:
  nprobe, G (codebook = 10*G centroids/subspace), shortlist,
  recall@5, touched (mean probed-cell candidates per query, the
  scale cost), and the shortlist hit rate.
"""

from __future__ import annotations

import itertools
import sys

import numpy as np
import pyarrow.parquet as pq

QUERY_MOD = 50
TOP_K = 5
M = 8  # subspaces
# coarse quantizer grid: (seed groups cg -> 10*cg cells, Lloyd iters)
COARSE = [(1, 0), (4, 2), (5, 2)]
NPROBES = (3, 4, 6, 8, 10)
SPILLS = (1, 2, 3)  # corpus multi-assignment depth


def load(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vid = t.column("vec_id").to_numpy()
    lab = t.column("label").to_numpy()
    emb = np.vstack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(vid)
    return vid[order], lab[order], emb[order]


def main(sf_dir: str) -> int:
    vid, lab, emb = load(sf_dir)
    n, dim = emb.shape
    sub = dim // M
    norm = np.linalg.norm(emb, axis=1)
    unit = emb / norm[:, None]
    q_mask = vid % QUERY_MOD == 0
    q_idx = np.where(q_mask)[0]

    # exact top-k (excluding self) — the recall ground truth
    cos_q = unit[q_idx] @ unit.T
    cos_q[np.arange(len(q_idx)), q_idx] = -np.inf
    exact = {
        vid[q_idx[i]]: set(
            vid[np.argpartition(-cos_q[i], TOP_K)[:TOP_K]]
        )
        for i in range(len(q_idx))
    }

    def coarse(cg: int, iters: int):
        """Coarse quantizer: 10*cg cells seeded by (label, vec_id % cg)
        group means, refined by `iters` spherical-Lloyd rounds (cosine
        assignment, mean re-centroid — kmeans_centroids' machinery).
        cg=1, iters=0 is the shipped label-mean quantizer."""
        cells = lab * cg + (vid % cg)
        k = 10 * cg
        for it in range(iters + 1):
            cents = np.full((k, emb.shape[1]), np.nan)
            for c in range(k):
                sel = cells == c
                if sel.any():
                    cents[c] = emb[sel].mean(axis=0)
            nrm = np.linalg.norm(cents, axis=1)
            cents_u = cents / nrm[:, None]
            cc = unit @ np.nan_to_num(cents_u, nan=0.0).T
            cc[:, np.isnan(nrm)] = -np.inf  # empty cells can't win
            if it < iters:
                cells = cc.argmax(axis=1)
        return cc, cc.argmax(axis=1)

    rows = []
    for coarse_cfg, G in itertools.product(COARSE, (1, 4)):
        cg, iters = coarse_cfg
        cell_cos, assign = coarse(cg, iters)
        # codebook: per subspace, 10*G centroids seeded by
        # (label, vec_id % G) groups — G=1 is the shipped label seeding
        group = lab * G + (vid % G)
        k = 10 * G
        book = np.zeros((M, k, sub))
        for j in range(k):
            sel = group == j
            for s in range(M):
                book[s, j] = emb[sel, s * sub : (s + 1) * sub].mean(axis=0)
        # corpus codes: per (vector, subspace) nearest codebook entry
        codes = np.zeros((n, M), dtype=np.int64)
        for s in range(M):
            x = emb[:, s * sub : (s + 1) * sub]
            d2 = ((x[:, None, :] - book[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d2.argmin(axis=1)
        # per-query ADC LUTs
        lut = np.zeros((len(q_idx), M, k))
        for s in range(M):
            xq = emb[q_idx, s * sub : (s + 1) * sub]
            lut[:, s, :] = ((xq[:, None, :] - book[s][None, :, :]) ** 2).sum(
                axis=2
            )
        order = np.argsort(-cell_cos, axis=1)
        for spill, nprobe, shortlist in itertools.product(
            SPILLS, NPROBES, (100, 200, 300)
        ):
            # spill (multi-assignment): each corpus vector indexed in
            # its top-`spill` cells — FAISS's standard cure for
            # cell-boundary recall loss; spill=1 is classic IVF
            kcells = cell_cos.shape[1]
            member = np.zeros((n, kcells), dtype=bool)
            for a in range(spill):
                member[np.arange(n), order[:, a]] = True
            probes = order[q_idx][:, :nprobe]
            hits = 0
            short_hits = 0
            touched = 0
            for i, qi in enumerate(q_idx):
                cand = np.where(member[:, probes[i]].any(axis=1))[0]
                cand = cand[cand != qi]
                touched += len(cand)
                adc = lut[i][np.arange(M)[:, None], codes[cand].T].sum(axis=0)
                sl = cand[np.argsort(adc)[:shortlist]]
                short_hits += len(exact[vid[qi]] & set(vid[sl]))
                rer = unit[sl] @ unit[qi]
                top = vid[sl[np.argsort(-rer)[:TOP_K]]]
                hits += len(exact[vid[qi]] & set(top))
            denom = len(q_idx) * TOP_K
            rows.append(
                dict(
                    coarse_cg=cg,
                    coarse_iters=iters,
                    n_cells=10 * cg,
                    spill=spill,
                    G=G,
                    k=k,
                    nprobe=nprobe,
                    shortlist=shortlist,
                    recall=round(hits / denom, 4),
                    shortlist_recall=round(short_hits / denom, 4),
                    touched=round(touched / len(q_idx), 1),
                )
            )
            print(rows[-1], flush=True)
    best = [r for r in rows if r["recall"] >= 0.8]
    best.sort(key=lambda r: (r["touched"], r["shortlist"]))
    print("\ncheapest configs with recall >= 0.8 (touched is the 100 TB cost):")
    for r in best[:5]:
        print(r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"))
