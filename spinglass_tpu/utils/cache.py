"""Solution / computation caches (reference optimization/performance_cache.py
:43-513 LRUCache/ComputationCache + performance_accelerator.py:25-561
IntelligentCache + fast_memoize). On TPU the compiler cache already covers
compiled programs; these caches cover *solutions*: identical (problem, config)
pairs skip re-annealing."""

from __future__ import annotations

import hashlib
import threading
import time
from collections import OrderedDict
from functools import wraps
from typing import Any, Callable, Optional

import numpy as np


class LRUCache:
    """Thread-safe LRU with TTL + hit stats."""

    def __init__(self, max_size: int = 128, ttl: Optional[float] = None):
        self.max_size = max_size
        self.ttl = ttl
        self._data: OrderedDict = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, key):
        with self._lock:
            if key not in self._data:
                self.misses += 1
                return None
            value, ts = self._data[key]
            if self.ttl is not None and time.time() - ts > self.ttl:
                del self._data[key]
                self.misses += 1
                return None
            self._data.move_to_end(key)
            self.hits += 1
            return value

    def put(self, key, value) -> None:
        with self._lock:
            self._data[key] = (value, time.time())
            self._data.move_to_end(key)
            while len(self._data) > self.max_size:
                self._data.popitem(last=False)

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0

    def clear(self) -> None:
        with self._lock:
            self._data.clear()


def problem_fingerprint(problem, config=None) -> str:
    """Stable hash of (J, h, config repr) for solution caching."""
    md = hashlib.sha256()
    md.update(np.ascontiguousarray(np.asarray(problem.j)).tobytes())
    md.update(np.ascontiguousarray(np.asarray(problem.h)).tobytes())
    if config is not None:
        md.update(repr(config).encode())
    return md.hexdigest()


_solution_cache = LRUCache(max_size=64)


def cached_anneal(problem, config=None, *, cache: Optional[LRUCache] = None,
                  anneal_fn: Optional[Callable] = None):
    """anneal() with solution caching keyed by (J, h, config)."""
    from spinglass_tpu.anneal.sa import anneal as _anneal

    cache = cache or _solution_cache
    fn = anneal_fn or _anneal
    key = problem_fingerprint(problem, config)
    hit = cache.get(key)
    if hit is not None:
        return hit
    result = fn(problem, config)
    cache.put(key, result)
    return result


def memoize(max_size: int = 128, ttl: Optional[float] = None):
    """Hashable-arg memoization decorator (reference fast_memoize)."""

    def decorator(fn):
        cache = LRUCache(max_size=max_size, ttl=ttl)

        @wraps(fn)
        def wrapper(*args, **kwargs):
            key = (args, tuple(sorted(kwargs.items())))
            hit = cache.get(key)
            if hit is not None:
                return hit
            out = fn(*args, **kwargs)
            cache.put(key, out)
            return out

        wrapper.cache = cache  # type: ignore[attr-defined]
        return wrapper

    return decorator


def anneal_cache_stats(cache: Optional[LRUCache] = None) -> dict:
    """Stats for the global solution cache (reference AdvancedCLI cache
    commands, cli/advanced_cli.py; performance_cache.py:43-513 stats)."""
    c = cache or _solution_cache
    return {
        "size": len(c._data),
        "max_size": c.max_size,
        "hits": c.hits,
        "misses": c.misses,
        "hit_rate": c.hit_rate,
    }


def enable_persistent_compile_cache(cache_dir: "Optional[str]" = None) -> str:
    """Point JAX at a persistent on-disk compilation cache. ON by default
    (~/.cache/jax_spinglass); SPINGLASS_JAX_CACHE=0|off disables, any
    other value is used as a custom cache directory ("1"/"true" keep the
    default location).

    History: in round 3 this was opt-in-off — engines closure-embedded the
    J matrix into every executable (278 MB serialized for the dense
    headline), and SHIPPING a cached executable through the axon tunnel
    measured 3x slower than a fresh compile of the small HLO. Round 4's
    operands-as-arguments contract (anneal.engines.SweepEngine) shrank the
    same executable to ~550 KB; a cache hit now takes the dense headline
    bench from ~70 s to ~23 s wall, so the cache is on by default again.
    No-op (returns '') when disabled; tolerant of JAX versions without the
    knobs."""
    import os

    env = os.environ.get("SPINGLASS_JAX_CACHE", "").strip()
    if not cache_dir and cache_dir is not None:
        # the pre-r4 API used cache_dir="" as the disable sentinel; keep
        # honoring it (ADVICE.md r4 #5: "" must not mean an enabled cache
        # at a cwd-relative empty path)
        return ""
    if cache_dir is None:
        # env kill-switch applies only when no explicit dir was passed —
        # a programmatic cache_dir argument always wins
        if env.lower() in ("0", "off", "false", "no"):
            return ""
        if env and env.lower() not in ("1", "true", "yes", "on"):
            cache_dir = env
        else:
            cache_dir = "~/.cache/jax_spinglass"
    cache_dir = os.path.expanduser(cache_dir)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache_dir
