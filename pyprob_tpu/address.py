"""Stochastic-procedure address extraction and the address dictionary.

Counterpart of the reference's frame-based scheme
(reference: pyprob/state.py:31-84) with one deliberate change: the reference
keys addresses on ``frame.f_lasti`` (bytecode instruction pointer) and
bytecode-level assignment-target decoding, which breaks across Python
versions (reference lesson: tests/test_trace.py:50-53).  Here the address is
derived from the **source line number** and a source-text regex for the
assignment target — stable across interpreter versions and identical under
``jax.vmap`` tracing (extraction runs once per call site at trace time).

Format: ``{lineno}__{reversed name chain}__{DistributionSuffix}__{instance}``
e.g. ``42__forward__mu__Normal__1``.
"""

from __future__ import annotations

import linecache
import re
import sys
from functools import lru_cache

from .concurrency import ConcurrentShelf

_ASSIGN_RE = re.compile(r"^\s*([A-Za-z_][\w\.]*(?:\[[^\]]*\])?)\s*=[^=]")
_RETURN_RE = re.compile(r"^\s*return\b")

# Frames whose code lives in these path fragments are framework-internal and
# skipped when walking out to user code.  The built-in model families
# (pyprob_tpu/models/) are user-level code and must NOT be skipped.
# jax frames appear mid-chain when user code is re-traced inside
# lax.while_loop/scan bodies (rejection_sample retries) and must not
# perturb addresses: stored-value replay is keyed on them.
_INTERNAL_MARKERS = (
    "pyprob_tpu",
    "/site-packages/jax/",
    "/jax/_src/",
    "/site-packages/equinox/",
)
_USER_MARKERS = ("pyprob_tpu/models",)


@lru_cache(maxsize=4096)
def _is_internal_frame(filename):
    # cached per filename: the substring scans run for every frame of
    # every site of every trace on the interpreter tier
    filename = filename or ""
    if any(m in filename for m in _USER_MARKERS):
        return False
    return any(m in filename for m in _INTERNAL_MARKERS)


@lru_cache(maxsize=65536)
def _extract_target_of_assignment(filename, lineno):
    line = linecache.getline(filename, lineno)
    m = _ASSIGN_RE.match(line)
    if m:
        return m.group(1)
    if _RETURN_RE.match(line):
        return "return"
    return None


def extract_address(root_function_name):
    """Build an address base from the current Python call stack.

    Walks outward from the first non-framework frame, collecting function
    names until (and including) the model's root function, mirroring the
    reference's chain construction (reference: state.py:31-50).
    """
    frame = sys._getframe(1)
    # Skip framework-internal frames (state.sample / observe wrappers).
    while frame is not None and _is_internal_frame(frame.f_code.co_filename):
        frame = frame.f_back
    if frame is None:
        return "0__unknown"
    lineno = frame.f_lineno
    filename = frame.f_code.co_filename
    names = []
    var_name = _extract_target_of_assignment(filename, lineno)
    names.append(var_name if var_name is not None else "?")
    while frame is not None:
        n = frame.f_code.co_name
        # framework-internal frames interleaved with user code (the
        # rejection_sample combinator, its compiled while-loop body) must
        # not enter the chain: addresses stay identical across tiers
        if _is_internal_frame(frame.f_code.co_filename):
            if n == root_function_name:
                # a framework-owned root (the markov-derived forward(),
                # smc_scan's per-hook lambdas): the model's code ends
                # here.  Walking past it would append the CALLER's stack
                # (test harness, script, REPL) — addresses would then
                # depend on where inference was invoked from, breaking
                # address stability across contexts/tiers.
                break
            frame = frame.f_back
            continue
        if n.startswith("<") and n != "<listcomp>":
            break
        names.append(n)
        if n == root_function_name:
            break
        frame = frame.f_back
    return "{}__{}".format(lineno, "__".join(reversed(names)))


class AddressDictionary:
    """Persistent address <-> short-id mapping (``__A{n}``) used to shrink
    addresses fed to the proposal network's embedding tables
    (reference: pyprob/address_dictionary.py:6-37)."""

    def __init__(self, file_name):
        self._file_name = file_name
        self._shelf = ConcurrentShelf(file_name)
        if "__length" not in self._shelf:
            self._shelf["__length"] = 0

    @lru_cache(maxsize=None)
    def address_to_id(self, address):
        key = "address__" + address
        existing = self._shelf.get(key, None)
        if existing is not None:
            return existing
        self._shelf.lock()
        try:
            # re-check under the lock: another process may have assigned an
            # id between the unlocked miss and lock acquisition
            existing = self._shelf.get(key, None)
            if existing is not None:
                return existing
            length = self._shelf.get("__length", 0)
            new_id = "__A{}".format(length + 1)
            self._shelf["__length"] = length + 1
            self._shelf[key] = new_id
            self._shelf["id__" + new_id] = address
        finally:
            self._shelf.unlock()
        return new_id

    @lru_cache(maxsize=None)
    def id_to_address(self, id_):
        return self._shelf["id__" + id_]
