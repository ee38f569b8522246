"""From-scratch MSER (Maximally Stable Extremal Regions), numpy + a
union-find sweep — the real algorithm behind the reference's watermark
detector (filtering_module.py:442-457: ``cv2.MSER_create();
len(detectRegions(gray)) > sensitivity``), replacing the round-1
three-threshold stand-in with faithful semantics:

- per-level flood: pixels join in intensity order; 4-connected
  components merge through a union-find whose smaller component dies
  into the larger (the component tree's leaf-to-root paths);
- each surviving component records its size as a step function of the
  threshold level (appended only on change — O(pixels + merges) total
  history, not O(levels × components));
- stability: v(i) = (|Q_{i+Δ}| − |Q_{i−Δ}|) / |Q_i| evaluated over the
  component's lifespan (sizes clamped to [birth, death]); a region is
  reported at local minima of v with v < max_variation and
  min_area ≤ |Q| ≤ max_area;
- nested near-duplicates inside one component path are pruned by
  min_diversity (relative size gap), the same knob cv2 exposes;
- both polarities (dark-on-light via the image, light-on-dark via its
  inversion), like OpenCV's two-pass detectRegions.

Defaults mirror ``cv2.MSER_create()``: delta=5, min_area=60,
max_area=14400, max_variation=0.25, min_diversity=0.2. Documented
deviation: inputs larger than ``max_side`` are block-mean downsampled
first with the area thresholds rescaled by the shrink factor (bounded
Python-side compute; cv2 runs full-resolution C++), so counts on large
photos approximate cv2's rather than matching exactly — the engine and
the crawl oracle share THIS implementation, so engine↔oracle
equivalence is unaffected.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

DELTA = 5
MIN_AREA = 60
MAX_AREA = 14400
MAX_VARIATION = 0.25
MIN_DIVERSITY = 0.2


def _sweep_count(
    gray: np.ndarray,
    delta: int,
    min_area: int,
    max_area: int,
    max_variation: float,
    min_diversity: float,
) -> int:
    """Count MSERs of ONE polarity (dark regions of ``gray``)."""
    h, w = gray.shape
    n = h * w
    flat = gray.reshape(-1).astype(np.int32)
    order = np.argsort(flat, kind="stable")
    parent = np.full(n, -1, dtype=np.int64)  # -1 = not yet flooded
    size = np.zeros(n, dtype=np.int64)
    comp_id = np.full(n, -1, dtype=np.int64)  # per ROOT: component id
    # per component: birth level, history [(level, size)], death level
    births: list[int] = []
    hist_l: list[list[int]] = []
    hist_s: list[list[int]] = []
    deaths: list[int] = []

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    pos = 0
    vals = flat[order]
    while pos < n:
        level = int(vals[pos])
        end = pos
        while end < n and vals[end] == level:
            end += 1
        changed: set[int] = set()
        for k in range(pos, end):
            p = int(order[k])
            parent[p] = p
            size[p] = 1
            cid = len(births)
            comp_id[p] = cid
            births.append(level)
            hist_l.append([])
            hist_s.append([])
            deaths.append(255)
            changed.add(p)
            y, x = divmod(p, w)
            for q in (
                p - w if y > 0 else -1,
                p + w if y < h - 1 else -1,
                p - 1 if x > 0 else -1,
                p + 1 if x < w - 1 else -1,
            ):
                if q < 0 or parent[q] < 0:
                    continue
                ra, rb = find(p), find(q)
                if ra == rb:
                    continue
                # smaller component dies into the larger
                if size[ra] < size[rb]:
                    ra, rb = rb, ra
                dead = int(comp_id[rb])
                deaths[dead] = level
                changed.discard(rb)
                parent[rb] = ra
                size[ra] += size[rb]
                changed.add(ra)
        for r in changed:
            rr = find(r)
            cid = int(comp_id[rr])
            hist_l[cid].append(level)
            hist_s[cid].append(int(size[rr]))
        pos = end

    # stability pass
    count = 0
    for cid in range(len(births)):
        ls, ss = hist_l[cid], hist_s[cid]
        if not ls:
            continue
        birth, death = ls[0], deaths[cid]
        if death - birth < 1 or ss[-1] < min_area:
            continue

        def size_at(lv: int) -> int:
            lv = min(max(lv, birth), death)
            i = bisect_right(ls, lv) - 1
            return ss[i] if i >= 0 else ss[0]

        lo, hi = birth, death
        vs = []
        for i in range(lo, hi + 1):
            si = size_at(i)
            vs.append((size_at(i + delta) - size_at(i - delta)) / si)
        last_accept_size = None
        for j, i in enumerate(range(lo, hi + 1)):
            v = vs[j]
            if v >= max_variation:
                continue
            if j > 0 and vs[j - 1] < v:
                continue
            if j < len(vs) - 1 and vs[j + 1] < v:
                continue
            si = size_at(i)
            if not (min_area <= si <= max_area):
                continue
            if (
                last_accept_size is not None
                and (si - last_accept_size) / si < min_diversity
            ):
                continue  # near-duplicate of the nested accepted region
            last_accept_size = si
            count += 1
    return count


def mser_region_count(
    px: np.ndarray,
    delta: int = DELTA,
    min_area: int = MIN_AREA,
    max_area: int = MAX_AREA,
    max_variation: float = MAX_VARIATION,
    min_diversity: float = MIN_DIVERSITY,
    max_side: int = 256,
) -> int:
    """Total MSER count over both polarities of a grayscale uint8-range
    image (2-D array; callers convert color via kernels.phash.to_gray)."""
    gray = np.asarray(px)
    if gray.ndim != 2:
        raise ValueError("mser_region_count expects a 2-D gray array")
    gray = gray.astype(np.float64)
    h, w = gray.shape
    sy, sx = max(1, (h + max_side - 1) // max_side), max(
        1, (w + max_side - 1) // max_side
    )
    if sy > 1 or sx > 1:
        th, tw = h // sy * sy, w // sx * sx
        if th == 0 or tw == 0:
            return 0
        gray = gray[:th, :tw].reshape(th // sy, sy, tw // sx, sx).mean(
            axis=(1, 3)
        )
        f = sy * sx
        min_area = max(1, min_area // f)
        max_area = max(min_area, max_area // f)
    g = np.clip(np.round(gray), 0, 255).astype(np.int32)
    args = (delta, min_area, max_area, max_variation, min_diversity)
    return _sweep_count(g, *args) + _sweep_count(255 - g, *args)
