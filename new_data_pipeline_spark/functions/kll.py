"""KLL-style mergeable quantile sketch (Karnin-Lang-Liberty, FOCS'16):
bounded memory, weight-exact compaction, associative merge.

The quantile twin of the HLL distinct-count path
(operators/sketches.py): exact quantiles need a full sort (or
percentile's full value collection per group); a KLL summary is O(k)
values per group, buildable per partition and MERGEABLE after the fact
— per-day summaries roll up to any coarser grain without rescanning
raw data. Normalized rank error is O(1/k); at K=400 the observed error
is well under 0.005, gated at 0.02 (4× margin) by the bounded-error
oracle in operators/quantile_sketch.py and unit tests.

Determinism: compaction keeps odd- or even-indexed items by a
deterministic counter parity instead of a coin flip, so retried Spark
tasks produce identical summaries (the formal KLL analysis uses random
parity; the deterministic variant trades the worst-case proof for
reproducibility and passes the same empirical gates — the standard
trade in production engines).

Weight exactness: a compaction of 2m items at weight w promotes m items
at weight 2w (odd remainders stay behind), so total weight always
equals the number of values added — rank queries never drift.
"""

from __future__ import annotations

K_DEFAULT = 400


class KLL:
    __slots__ = ("k", "levels", "n", "_compactions")

    def __init__(self, k: int = K_DEFAULT):
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.n = 0
        self._compactions = 0

    # ---------------------------------------------------------- build

    def add(self, v: float) -> None:
        self.levels[0].append(v)
        self.n += 1
        if len(self.levels[0]) >= self._cap(0):
            self._compact(0)

    def _cap(self, level: int) -> int:
        # geometric capacity: top level holds k, each lower level 2/3
        depth = len(self.levels)
        c = int(self.k * (2.0 / 3.0) ** (depth - 1 - level))
        return max(c, 2)

    def _compact(self, level: int) -> None:
        items = self.levels[level]
        items.sort()
        m = len(items) - (len(items) % 2)   # compact an even count only
        keep_odd = self._compactions & 1    # deterministic parity
        promoted = items[keep_odd:m:2]
        remainder = items[m:]
        self._compactions += 1
        self.levels[level] = remainder
        if level + 1 == len(self.levels):
            self.levels.append([])
        self.levels[level + 1].extend(promoted)
        if len(self.levels[level + 1]) >= self._cap(level + 1):
            self._compact(level + 1)

    # ---------------------------------------------------------- merge

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for lv, items in enumerate(other.levels):
            self.levels[lv].extend(items)
        self.n += other.n
        for lv in range(len(self.levels)):
            while len(self.levels[lv]) >= self._cap(lv) \
                    and len(self.levels[lv]) >= 2:
                self._compact(lv)
        return self

    # ---------------------------------------------------------- query

    def quantile(self, q: float) -> float:
        pairs = [(v, 1 << lv)
                 for lv, items in enumerate(self.levels) for v in items]
        if not pairs:
            raise ValueError("empty sketch")
        pairs.sort()
        total = sum(w for _, w in pairs)
        target = q * total
        cum = 0
        for v, w in pairs:
            cum += w
            if cum >= target:
                return v
        return pairs[-1][0]

    # ------------------------------------------------------ serialize

    def to_rows(self) -> list[tuple[int, float]]:
        return [(lv, v) for lv, items in enumerate(self.levels)
                for v in items]

    @classmethod
    def from_rows(cls, rows, k: int = K_DEFAULT) -> "KLL":
        s = cls(k)
        for lv, v in rows:
            while len(s.levels) <= lv:
                s.levels.append([])
            s.levels[lv].append(v)
            s.n += 1 << lv
        return s
