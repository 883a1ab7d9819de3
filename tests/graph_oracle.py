"""Independent serial BFS oracle implementing the engine spec
(SURVEY.md §2.6): forward paths, lexicographically-smallest tie-break,
None for unreachable. Deliberately NOT derived from the reference's
``BFS_serial.py`` (its path construction is buggy — SURVEY §2.9 W1).
"""

from __future__ import annotations

from collections import defaultdict


def load_edge_list(path: str) -> list[tuple[int, int]]:
    edges = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            a, b = line.split()[:2]
            edges.append((int(a), int(b)))
    return edges


def bfs_oracle(
    edges: list[tuple[int, int]], source: int = 0, directed: bool = False
) -> dict[int, tuple[int | None, list[int] | None]]:
    """Return {vertex: (dist, path)} for every vertex in the graph."""
    adj: dict[int, set[int]] = defaultdict(set)
    vertices = {source}
    for a, b in edges:
        vertices.add(a)
        vertices.add(b)
        if a != b:
            adj[a].add(b)
            if not directed:
                adj[b].add(a)

    dist: dict[int, int] = {source: 0}
    path: dict[int, list[int]] = {source: [source]}
    frontier = [source]
    while frontier:
        nxt: dict[int, list[int]] = {}
        for u in frontier:
            for v in adj[u]:
                if v in dist:
                    continue
                cand = path[u] + [v]
                if v not in nxt or cand < nxt[v]:
                    nxt[v] = cand
        for v, p in nxt.items():
            dist[v] = dist[p[-2]] + 1 if len(p) > 1 else 0
            path[v] = p
        frontier = sorted(nxt)

    return {
        v: (dist.get(v), path.get(v)) for v in vertices
    }
