"""Prototype: monotone (per-lane dest-sorted) G5 packing — fill cost vs
the current first-fit. Measures slots/nnz on one panel of 96^3-permuted
Poisson at W=128, S_p=512.

Constraints per staging row: lane rl holds <=1 slot; per cl-lane one
(window-row) source; rows are window-pure in tiles of 8; per rl-lane,
dest q positions nondecreasing (cumsum segments contiguous without any
src sort)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import amgx_tpu as amgx                                    # noqa: E402
from amgx_tpu.matrix import CSRMatrix                      # noqa: E402

side = int(sys.argv[1]) if len(sys.argv) > 1 else 96
W, S_p = 128, 512
a = amgx.gallery.poisson7pt(side, side, side, dtype=np.float32)
rng = np.random.default_rng(0)
perm = rng.permutation(a.n_rows)
s = a.to_scipy().tocsr()[perm][:, perm].tocsr()
n = a.n_rows
rows = np.repeat(np.arange(n), np.diff(s.indptr))
cols = s.indices

panel_rows = S_p * 128
p0 = 0  # first panel
m = (rows >= p0) & (rows < p0 + panel_rows)
er, ec = rows[m] - p0, cols[m]
print(f"panel edges: {er.size}")
q = er // 128
rl = er % 128
w = ec // (W * 128)
hi = (ec // 128) % W
cl = ec % 128
# process in global row (q, rl) order with per-row grouping
order = np.lexsort((cl, w, er))
er, q, rl, w, hi, cl = er[order], q[order], rl[order], w[order], \
    hi[order], cl[order]

t0 = time.perf_counter()
# rows: list of dicts per window: positions + cl->hi maps
n_alloc = 0                       # total staging rows allocated
tiles_by_w = {}                   # w -> list of [pos, cl_hi(dict)]
prev_max = np.full(128, -1)       # per rl: last position used
slots = 0
open_limit = 48                   # scan at most this many recent rows
tail = []                         # global allocation order (for stats)

i = 0
E = er.size
while i < E:
    j = i
    row_id = er[i]
    while j < E and er[j] == row_id:
        j += 1
    lane = rl[i]
    start_min = prev_max[lane] + 1
    used_max = prev_max[lane]
    for k in range(i, j):
        wk, hik, clk = w[k], hi[k], cl[k]
        lst = tiles_by_w.setdefault(wk, [])
        placed = -1
        # scan open rows of this window at position >= start_min
        for r in lst[-open_limit:]:
            if r[0] < start_min:
                continue
            ch = r[1]
            prev = ch.get(clk)
            if prev is None or prev == hik:
                # also lane rl must be free in this row
                if lane not in r[2]:
                    ch[clk] = hik
                    r[2].add(lane)
                    placed = r[0]
                    break
        if placed < 0:
            # allocate a new tile (8 rows) for this window at the tail
            base = n_alloc
            n_alloc += 8
            newrows = [[base + t, {}, set()] for t in range(8)]
            lst.extend(newrows)
            rr = newrows[0]
            rr[1][clk] = hik
            rr[2].add(lane)
            placed = rr[0]
        used_max = max(used_max, placed)
        slots += 1
    prev_max[lane] = used_max
    i = j

fill = er.size / (n_alloc * 128)
print(f"monotone: rows={n_alloc} slots/nnz={n_alloc*128/er.size:.3f} "
      f"fill={fill:.3f}  ({time.perf_counter()-t0:.1f}s)")
print("current first-fit slots/nnz at this geometry: 1.441 (measured)")
