"""Union-find (disjoint-set) over string keys, for connected-component
clustering of duplicate-pair edges (north_rule; no reference analogue — the
reference only returns ranked neighbors, ``ndd/server_ndd.py:127-142``).

The driver-side DSU is appropriate because dup-pair EDGES are tiny relative to
the corpus (dup density << 1); the scale path for adversarial edge counts is
iterative min-label propagation via groupby (see stages/cluster.py).
"""

from __future__ import annotations


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}
        self.rank: dict[str, int] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        if x not in parent:
            parent[x] = x
            self.rank[x] = 0
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1

    def components(self) -> dict[str, str]:
        """key -> canonical component label (min member, for determinism)."""
        groups: dict[str, list[str]] = {}
        for x in self.parent:
            groups.setdefault(self.find(x), []).append(x)
        out: dict[str, str] = {}
        for members in groups.values():
            label = min(members)
            for m in members:
                out[m] = label
        return out
