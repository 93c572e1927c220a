"""ctypes bindings for the native routing library (native/router.cpp).

Falls back to a pure-Python Dijkstra when the shared library has not been
built (``make -C native``); the compiler auto-builds it on first use when a
toolchain is available.
"""

from __future__ import annotations

import ctypes
import heapq
import logging
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libdscrouter.so")
_NATIVE_SRC = os.path.join(
    os.path.dirname(__file__), "..", "..", "native"
)
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_SRC)],
                check=True, capture_output=True,
            )
        except Exception as e:  # no toolchain: python fallback
            logging.info("native router build skipped: %s", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.dsc_shortest_path.restype = ctypes.c_int32
    lib.dsc_shortest_path.argtypes = [
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        ctypes.c_int32,
    ]
    _lib = lib
    return lib


class EdgeGraphRouter:
    """Shortest-path router over the edge graph (CSR), travel-time costs."""

    def __init__(self, n_edges: int, succ: List[List[int]], cost):
        self.n = n_edges
        self.cost = np.asarray(cost, np.float64)
        indptr = np.zeros(n_edges + 1, np.int32)
        idx = []
        for e in range(n_edges):
            indptr[e + 1] = indptr[e] + len(succ[e])
            idx.extend(succ[e])
        self.indptr = indptr
        self.indices = np.asarray(idx, np.int32)
        self.succ = succ
        self._lib = _load()

    def route(self, src: int, dst: int) -> List[int]:
        if self._lib is not None:
            cap = self.n + 1
            out = np.empty(cap, np.int32)
            n = self._lib.dsc_shortest_path(
                self.n, self.indptr, self.indices, self.cost,
                np.int32(src), np.int32(dst), out, np.int32(cap),
            )
            if n < 0:
                raise ValueError(f"no route {src} -> {dst}")
            return out[:n].tolist()
        return self._route_py(src, dst)

    def _route_py(self, src: int, dst: int) -> List[int]:
        dist = {src: self.cost[src]}
        prev = {}
        pq = [(dist[src], src)]
        while pq:
            d, e = heapq.heappop(pq)
            if e == dst:
                break
            if d > dist.get(e, np.inf):
                continue
            for nxt in self.succ[e]:
                nd = d + self.cost[nxt]
                if nd < dist.get(nxt, np.inf):
                    dist[nxt] = nd
                    prev[nxt] = e
                    heapq.heappush(pq, (nd, nxt))
        if dst not in dist:
            raise ValueError(f"no route {src} -> {dst}")
        path = [dst]
        while path[-1] != src:
            path.append(prev[path[-1]])
        return path[::-1]

    def route_via(self, waypoints: List[int]) -> List[int]:
        """Concatenated shortest path through waypoint edges (SUMO's
        <flow from to via> semantics)."""
        full: List[int] = []
        for a, b in zip(waypoints[:-1], waypoints[1:]):
            seg = self.route(a, b)
            if full:
                seg = seg[1:]
            full.extend(seg)
        return full
