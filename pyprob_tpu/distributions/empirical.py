"""Empirical: weighted sample container — the posterior result type.

Counterpart of the reference's ``Empirical``
(reference: pyprob/distributions/empirical.py:29-921) with the same four
storage modes (MEMORY / FILE / CONCAT_MEMORY / CONCAT_FILE), the
add/finalize lifecycle, categorical-weight sampling, the transform suite
(map/filter/resample/thin/slice/combine_duplicates/reweight), weighted
moments, ESS, sklearn-GMM density estimation, provenance metadata, and
sqlite-shelf persistence with concat of chunk files.

Weight math is float64 on the host (log-space) regardless of the device
compute dtype — matching the reference's float64 logits policy
(reference: empirical.py:71,300) without forcing x64 onto the TPU.
"""

from __future__ import annotations

import copy as _copy
import enum
import math
import pickle

import numpy as np

from .. import util
from ..concurrency import Shelf
from .distribution import Distribution


class EmpiricalType(enum.Enum):
    MEMORY = 0
    FILE = 1
    CONCAT_MEMORY = 2
    CONCAT_FILE = 3


_FILE_SYNC_EVERY = 25  # periodic shelf sync cadence (reference: empirical.py:332-338)


class Empirical(Distribution):
    def __init__(
        self,
        values=None,
        log_weights=None,
        weights=None,
        file_name=None,
        file_read_only=False,
        file_sync_timeout=25,
        concat_empiricals=None,
        concat_empirical_file_names=None,
        name="Empirical",
    ):
        super().__init__(name=name, address_suffix="Empirical", batch_shape=())
        self._finalized = False
        self._closed = False
        self._log_weights_norm = None
        self._probs = None
        self._ess = None
        self._mean_cache = None
        self._variance_cache = None
        self._mode_cache = None
        self._metadata = []
        self._file_name = file_name
        self._shelf = None
        self._file_read_only = file_read_only
        self._adds_since_sync = 0

        if concat_empiricals is not None:
            self._type = EmpiricalType.CONCAT_MEMORY
            self._concat_empiricals = list(concat_empiricals)
            self._concat_lengths = [e.length for e in self._concat_empiricals]
            self.add_metadata(op="concat", num_sources=len(self._concat_empiricals))
            self.finalize()
            return
        if concat_empirical_file_names is not None:
            self._type = EmpiricalType.CONCAT_FILE
            self._concat_empiricals = [
                Empirical(file_name=f, file_read_only=True)
                for f in concat_empirical_file_names
            ]
            self._concat_lengths = [e.length for e in self._concat_empiricals]
            self.add_metadata(
                op="concat_files", files=list(concat_empirical_file_names)
            )
            if file_name is not None:
                # persist a concat descriptor so reopening file_name finds
                # the chunk files (reference: empirical.py:89-96)
                self._shelf = Shelf(file_name)
                self._shelf["concat_files"] = list(concat_empirical_file_names)
                self._shelf["name"] = name
                self._shelf.sync()
            self.finalize()
            return

        if file_name is not None:
            self._type = EmpiricalType.FILE
            self._shelf = Shelf(file_name)
            concat_files = self._shelf.get("concat_files")
            if concat_files is not None:
                # this file is a concat descriptor: reopen as CONCAT_FILE
                self._shelf.close()
                self._shelf = None
                self._type = EmpiricalType.CONCAT_FILE
                self._concat_empiricals = [
                    Empirical(file_name=f, file_read_only=True)
                    for f in concat_files
                ]
                self._concat_lengths = [
                    e.length for e in self._concat_empiricals
                ]
                self.add_metadata(op="concat_files", files=list(concat_files))
                self.finalize()
                return
            self._length = self._shelf.get("num_values", 0)
            self._log_weights = list(self._shelf.get("log_weights", []))
            self._metadata = self._shelf.get("metadata", [])
            stored_name = self._shelf.get("name", None)
            if stored_name is not None:
                self._name = stored_name
            elif not file_read_only:
                self._shelf["name"] = name
            if self._length > 0:
                self.finalize()
        else:
            self._type = EmpiricalType.MEMORY
            self._values = []
            self._log_weights = []
            self._length = 0

        if values is not None:
            if log_weights is not None:
                lw = np.asarray(log_weights, dtype=np.float64).reshape(-1)
            elif weights is not None:
                w = np.asarray(weights, dtype=np.float64).reshape(-1)
                lw = util.safe_log(w)
            else:
                lw = np.zeros(len(values), dtype=np.float64)
            if len(lw) != len(values):
                raise ValueError("values and weights must have equal length")
            for v, l in zip(values, lw):
                self.add(v, log_weight=float(l))
            self.finalize()

    @classmethod
    def from_arrays(cls, values, log_weights=None, name="Empirical"):
        """Bulk in-memory construction from arrays — avoids the per-add
        overhead for large compiled-tier result sets."""
        e = cls(name=name)
        e._values = list(values)
        if log_weights is None:
            e._log_weights = [0.0] * len(e._values)
        else:
            lw = np.nan_to_num(
                np.asarray(log_weights, dtype=np.float64).reshape(-1),
                nan=-np.inf,
            )
            e._log_weights = lw.tolist()
        e._length = len(e._values)
        e.finalize()
        return e

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------
    @property
    def empirical_type(self):
        return self._type

    @property
    def file_name(self):
        return self._file_name

    @property
    def length(self):
        return self._length

    def __len__(self):
        return self._length

    @property
    def finalized(self):
        return self._finalized

    def add(self, value, log_weight=0.0, weight=None):
        if self._type in (EmpiricalType.CONCAT_MEMORY, EmpiricalType.CONCAT_FILE):
            raise RuntimeError("Cannot add to a concatenated Empirical")
        if weight is not None:
            log_weight = math.log(weight) if weight > 0 else -math.inf
        log_weight = float(util.to_scalar(log_weight))
        self._finalized = False
        if self._type == EmpiricalType.FILE:
            if self._file_read_only:
                raise RuntimeError("Empirical file opened read-only")
            # bulk-write mode: per-trace sqlite COMMIT (autocommit) costs
            # an fsync each — measured DOMINATING ParallelModel chunk
            # writers at tens of ms/trace (r5).  Hold one transaction and
            # land it on the existing _FILE_SYNC_EVERY cadence; sync()
            # and close() commit whatever is pending.
            self._shelf._in_transaction = True
            self._shelf[f"value_{self._length}"] = value
            self._log_weights.append(log_weight)
            self._length += 1
            self._adds_since_sync += 1
            if self._adds_since_sync >= _FILE_SYNC_EVERY:
                self._sync_file_meta()
        else:
            self._values.append(value)
            self._log_weights.append(log_weight)
            self._length += 1

    def add_sequence(self, values, log_weights=None):
        if log_weights is None:
            log_weights = np.zeros(len(values))
        for v, l in zip(values, np.asarray(log_weights, dtype=np.float64).reshape(-1)):
            self.add(v, log_weight=float(l))

    def _sync_file_meta(self):
        self._shelf["num_values"] = self._length
        self._shelf["log_weights"] = list(self._log_weights)
        self._shelf["metadata"] = self._metadata
        self._shelf._in_transaction = False
        self._shelf.sync()
        self._adds_since_sync = 0

    def finalize(self):
        if self._type in (EmpiricalType.CONCAT_MEMORY, EmpiricalType.CONCAT_FILE):
            self._length = sum(self._concat_lengths)
            self._log_weights = [
                l for e in self._concat_empiricals for l in e._log_weights
            ]
        elif self._type == EmpiricalType.FILE and not self._file_read_only:
            self._sync_file_meta()
        lw = np.asarray(self._log_weights, dtype=np.float64)
        if lw.size:
            lw = np.nan_to_num(lw, nan=-np.inf)
            m = lw.max()
            if np.isinf(m) and m < 0:
                self._log_weights_norm = np.full_like(lw, -math.log(max(lw.size, 1)))
            else:
                self._log_weights_norm = lw - (
                    m + math.log(np.exp(lw - m).sum())
                )
            self._probs = np.exp(self._log_weights_norm)
            self._ess = util.effective_sample_size(lw)
        else:
            self._log_weights_norm = lw
            self._probs = lw
            self._ess = 0.0
        self._mean_cache = None
        self._variance_cache = None
        self._mode_cache = None
        self._finalized = True
        return self

    def close(self):
        if self._type == EmpiricalType.FILE and self._shelf is not None:
            if not self._file_read_only:
                self._sync_file_meta()
            self._shelf.close()
        if self._type == EmpiricalType.CONCAT_FILE:
            if self._shelf is not None:  # concat descriptor file
                self._shelf.close()
                self._shelf = None
            for e in self._concat_empiricals:
                e.close()
        self._closed = True

    def rename(self, name):
        self._name = name
        if self._type == EmpiricalType.FILE and not self._file_read_only:
            self._shelf["name"] = name
        return self

    # ------------------------------------------------------------------
    # metadata provenance (reference: empirical.py:183-184)
    # ------------------------------------------------------------------
    def add_metadata(self, **kwargs):
        self._metadata.append(dict(kwargs))

    @property
    def metadata(self):
        return self._metadata

    def metadata_yaml(self):
        import yaml

        return yaml.safe_dump(self._metadata)

    # ------------------------------------------------------------------
    # value access
    # ------------------------------------------------------------------
    def _check_finalized(self):
        if not self._finalized:
            self.finalize()

    def _get_value(self, i):
        if i < 0:
            i += self._length
        if not (0 <= i < self._length):
            raise IndexError(i)
        if self._type == EmpiricalType.MEMORY:
            return self._values[i]
        if self._type == EmpiricalType.FILE:
            return self._shelf[f"value_{i}"]
        # concat types
        for e, n in zip(self._concat_empiricals, self._concat_lengths):
            if i < n:
                return e._get_value(i)
            i -= n
        raise IndexError(i)

    def get_values(self):
        return [self._get_value(i) for i in range(self._length)]

    def values_numpy(self, dtype=np.float64):
        return np.asarray(
            [np.asarray(self._get_value(i)) for i in range(self._length)],
            dtype=dtype,
        )

    @property
    def log_weights(self):
        return np.asarray(self._log_weights, dtype=np.float64)

    def log_weights_numpy(self):
        return np.asarray(self._log_weights, dtype=np.float64)

    def _log_weights_normalized(self):
        self._check_finalized()
        return self._log_weights_norm

    @property
    def weights(self):
        self._check_finalized()
        return self._probs

    def __getitem__(self, index):
        self._check_finalized()
        if isinstance(index, slice):
            idx = range(*index.indices(self._length))
            return Empirical(
                values=[self._get_value(i) for i in idx],
                log_weights=[self._log_weights[i] for i in idx],
                name=self._name,
            )
        return self._get_value(index)

    # ------------------------------------------------------------------
    # sampling
    # ------------------------------------------------------------------
    def sample(self, rng=None, sample_shape=()):
        self._check_finalized()
        if self._length == 0:
            raise RuntimeError("Cannot sample from empty Empirical")
        if rng is None or not isinstance(rng, np.random.Generator):
            rng = util.get_rng()
        n = int(np.prod(sample_shape)) if sample_shape else 1
        idx = rng.choice(self._length, size=n, p=self._probs)
        vals = [self._get_value(int(i)) for i in idx]
        if not sample_shape:
            return vals[0]
        try:
            return np.asarray(vals).reshape(
                tuple(sample_shape) + np.asarray(vals[0]).shape
            )
        except (ValueError, TypeError):
            return vals

    # ------------------------------------------------------------------
    # transforms — each returns a new in-memory Empirical and logs metadata
    # ------------------------------------------------------------------
    def copy(self, file_name=None):
        out = Empirical(file_name=file_name, name=self._name)
        for i in range(self._length):
            out.add(self._get_value(i), log_weight=self._log_weights[i])
        out._metadata = list(self._metadata) + [{"op": "copy"}]
        out.finalize()
        return out

    def map(self, func):
        self._check_finalized()
        out = Empirical(
            values=[func(self._get_value(i)) for i in range(self._length)],
            log_weights=list(self._log_weights),
            name=self._name,
        )
        out._metadata = list(self._metadata) + [{"op": "map"}]
        return out

    def filter(self, predicate):
        self._check_finalized()
        vals, lws = [], []
        for i in range(self._length):
            v = self._get_value(i)
            if predicate(v):
                vals.append(v)
                lws.append(self._log_weights[i])
        out = Empirical(values=vals, log_weights=lws, name=self._name)
        out._metadata = list(self._metadata) + [{"op": "filter"}]
        return out

    condition = filter  # hard conditioning by predicate (reference: empirical.py:469)

    def reweight(self, log_weight_func):
        """New log weights computed from values."""
        self._check_finalized()
        vals = self.get_values()
        out = Empirical(
            values=vals,
            log_weights=[float(log_weight_func(v)) for v in vals],
            name=self._name,
        )
        out._metadata = list(self._metadata) + [{"op": "reweight"}]
        return out

    def reobserve(
        self,
        likelihood_funcs=None,
        observe=None,
        likelihood_importance=1.0,
        min_index=None,
        max_index=None,
        file_name=None,
    ):
        """Rescore a trace-valued Empirical under new observed values and/or
        replacement likelihoods (reference: empirical.py:469-544).  Best
        used immediately after an importance-sampling posterior."""
        import warnings as _warnings

        from ..trace import Trace, Variable

        if self._length == 0:
            return self
        self._check_finalized()
        if not isinstance(self._get_value(0), Trace):
            raise RuntimeError(
                "Reobserve can only be used with Empiricals containing "
                "execution traces."
            )
        last_op = self._metadata[-1] if self._metadata else {}
        if not (
            last_op.get("op") == "posterior"
            and "IMPORTANCE_SAMPLING" in str(last_op.get("inference_engine", ""))
        ):
            _warnings.warn(
                "Reobserve should ideally follow an importance-sampling "
                "posterior; the last recorded operation was not one."
            )
        observe = observe or {}
        likelihood_funcs = likelihood_funcs or {}
        lo = min_index or 0
        hi = max_index if max_index is not None else self._length
        out = Empirical(name=self._name, file_name=file_name)
        for i in range(lo, hi):
            trace = self._get_value(i)
            new_trace = Trace()
            # A repeated name (a MarkovModel's per-step observe) transports
            # as ONE stacked [T, ...] array (Trace.named_value semantics):
            # each occurrence rescoreds against its own row.
            name_counts = {}
            for v in trace.variables:
                if v.observable and v.name is not None:
                    name_counts[v.name] = name_counts.get(v.name, 0) + 1
            occ = {}
            for v in trace.variables:
                if v.observable:
                    if v.name in observe:
                        value, observed = observe[v.name], True
                        if name_counts.get(v.name, 0) > 1:
                            k = occ.get(v.name, 0)
                            occ[v.name] = k + 1
                            value = np.asarray(value)[k]
                    elif v.observed:
                        value, observed = v.value, True
                    else:
                        value, observed = v.value, False
                    if v.name in likelihood_funcs:
                        distribution = likelihood_funcs[v.name](v, trace)
                        if value is None:
                            log_prob = None
                            log_importance_weight = None
                        else:
                            log_prob = likelihood_importance * distribution.log_prob(
                                value, sum=True
                            )
                            log_importance_weight = float(log_prob)
                    else:
                        distribution = v.distribution
                        if observed and distribution is not None and v.name in observe:
                            log_prob = likelihood_importance * distribution.log_prob(
                                value, sum=True
                            )
                            log_importance_weight = float(log_prob)
                        else:
                            log_prob = v.log_prob
                            log_importance_weight = v.log_importance_weight
                    v = Variable(
                        distribution=distribution,
                        value=value,
                        address_base=v.address_base,
                        address=v.address,
                        instance=v.instance,
                        log_prob=log_prob,
                        log_importance_weight=log_importance_weight,
                        control=v.control,
                        name=v.name,
                        observed=observed,
                        reused=v.reused,
                        tagged=v.tagged,
                    )
                new_trace.add(v)
            new_trace.end(result=trace.result, execution_time_sec=trace.execution_time_sec)
            out.add(new_trace, new_trace.log_importance_weight)
        out.finalize()
        out._metadata = list(self._metadata) + [
            {"op": "reobserve", "length": self._length}
        ]
        return out

    def resample(self, num_samples, map_func=None):
        """Multinomial resampling to uniform weights
        (reference: empirical.py:509-523)."""
        self._check_finalized()
        rng = util.get_rng()
        idx = rng.choice(self._length, size=num_samples, p=self._probs)
        vals = [self._get_value(int(i)) for i in idx]
        if map_func is not None:
            vals = [map_func(v) for v in vals]
        out = Empirical(values=vals, name=self._name)
        out._metadata = list(self._metadata) + [
            {"op": "resample", "num_samples": num_samples}
        ]
        return out

    def thin(self, num_samples, map_func=None):
        """Evenly spaced subset (reference: empirical.py:525-544)."""
        self._check_finalized()
        step = max(1, self._length // num_samples)
        idx = list(range(0, self._length, step))[:num_samples]
        vals = [self._get_value(i) for i in idx]
        if map_func is not None:
            vals = [map_func(v) for v in vals]
        out = Empirical(
            values=vals,
            log_weights=[self._log_weights[i] for i in idx],
            name=self._name,
        )
        out._metadata = list(self._metadata) + [
            {"op": "thin", "num_samples": num_samples}
        ]
        return out

    def combine_duplicates(self):
        """Merge equal values, summing weights (reference: empirical.py:809-834)."""
        self._check_finalized()
        buckets = {}
        for i in range(self._length):
            v = self._get_value(i)
            try:
                k = v if isinstance(v, (int, float, str, bool)) else pickle.dumps(v)
            except Exception:
                k = id(v)
            if k in buckets:
                buckets[k][1].append(self._log_weights[i])
            else:
                buckets[k] = (v, [self._log_weights[i]])
        vals, lws = [], []
        for v, ws in buckets.values():
            vals.append(v)
            ws = np.asarray(ws, dtype=np.float64)
            m = ws.max()
            lws.append(float(m + math.log(np.exp(ws - m).sum())))
        out = Empirical(values=vals, log_weights=lws, name=self._name)
        out._metadata = list(self._metadata) + [{"op": "combine_duplicates"}]
        return out

    def unweighted(self):
        self._check_finalized()
        out = Empirical(values=self.get_values(), name=self._name)
        out._metadata = list(self._metadata) + [{"op": "unweighted"}]
        return out

    @property
    def weighted(self):
        """True when the (normalized) weights are non-uniform (reference:
        pyprob/distributions/empirical.py:664-665)."""
        self._check_finalized()
        if self._length == 0:
            return False
        return not np.allclose(self._probs, 1.0 / self._length)

    @staticmethod
    def from_distribution(distribution, num_samples):
        """IID-sample another distribution into an unweighted Empirical
        (reference: pyprob/distributions/empirical.py:295-296)."""
        return Empirical(
            values=[distribution.sample() for _ in range(num_samples)]
        )

    def arg_max(self, map_func):
        """Value maximizing ``map_func`` over the support (ties: last wins,
        matching reference pyprob/distributions/empirical.py:730-742)."""
        self._check_finalized()
        best_val, best_i = None, None
        for i in range(self._length):
            v = map_func(self._get_value(i))
            if best_val is None or v >= best_val:
                best_val, best_i = v, i
        if best_i is None:
            raise ValueError("arg_max of an empty Empirical")
        return self._get_value(best_i)

    def arg_min(self, map_func):
        """Value minimizing ``map_func`` over the support (reference:
        pyprob/distributions/empirical.py:744-756)."""
        self._check_finalized()
        best_val, best_i = None, None
        for i in range(self._length):
            v = map_func(self._get_value(i))
            if best_val is None or v <= best_val:
                best_val, best_i = v, i
        if best_i is None:
            raise ValueError("arg_min of an empty Empirical")
        return self._get_value(best_i)

    def save_metadata(self, file_name):
        """Dump the metadata/provenance list to a YAML file (reference:
        pyprob/distributions/empirical.py:916-918)."""
        with open(file_name, "w") as f:
            f.write(self.metadata_yaml())

    # ------------------------------------------------------------------
    # statistics (weighted, float64 host math)
    # ------------------------------------------------------------------
    @property
    def effective_sample_size(self):
        self._check_finalized()
        return self._ess

    def expectation(self, func):
        self._check_finalized()
        total = None
        for i in range(self._length):
            term = np.asarray(func(self._get_value(i)), dtype=np.float64) * self._probs[i]
            total = term if total is None else total + term
        return total

    @property
    def mean(self):
        if self._mean_cache is None:
            self._mean_cache = self.expectation(lambda v: np.asarray(v, dtype=np.float64))
        return self._mean_cache

    @property
    def variance(self):
        if self._variance_cache is None:
            m = self.mean
            self._variance_cache = self.expectation(
                lambda v: (np.asarray(v, dtype=np.float64) - m) ** 2
            )
        return self._variance_cache

    @property
    def skewness(self):
        m, s = self.mean, self.stddev
        return self.expectation(
            lambda v: ((np.asarray(v, dtype=np.float64) - m) / s) ** 3
        )

    @property
    def kurtosis(self):
        m, s = self.mean, self.stddev
        return self.expectation(
            lambda v: ((np.asarray(v, dtype=np.float64) - m) / s) ** 4
        )

    @property
    def mode(self):
        """Most probable value — max combined weight (reference: empirical.py:703)."""
        if self._mode_cache is None:
            combined = self.combine_duplicates()
            i = int(np.argmax(combined._probs))
            self._mode_cache = combined._get_value(i)
        return self._mode_cache

    @property
    def median(self):
        self._check_finalized()
        vals = self.values_numpy()
        if vals.ndim > 1:
            order = np.argsort(vals.reshape(self._length, -1)[:, 0], kind="stable")
        else:
            order = np.argsort(vals, kind="stable")
        cum = np.cumsum(self._probs[order])
        i = int(np.searchsorted(cum, 0.5))
        i = min(i, self._length - 1)
        return self._get_value(int(order[i]))

    def quantile(self, q):
        """Weighted posterior quantile(s) (beyond parity — the reference's
        Empirical stops at mode/median/min/max).  ``q``: float or sequence
        in [0, 1].  Multi-dimensional values reduce by their first
        component, like ``median``."""
        self._check_finalized()
        vals = self.values_numpy()
        flat = vals.reshape(self._length, -1)[:, 0] if vals.ndim > 1 else vals
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if np.any((qs < 0.0) | (qs > 1.0)):
            raise ValueError("quantiles must be in [0, 1]")
        order = np.argsort(flat, kind="stable")
        cum = np.cumsum(np.asarray(self._probs)[order])
        idx = np.minimum(np.searchsorted(cum, qs), self._length - 1)
        out = flat[order[idx]]
        return float(out[0]) if np.ndim(q) == 0 else out

    def hpd_interval(self, mass=0.9):
        """Highest-posterior-density interval: the SHORTEST interval
        carrying ``mass`` of the weighted samples (Chen & Shao 1999
        shortest-interval estimator on the weighted empirical CDF), for
        scalar-valued posteriors.  Narrower than the equal-tailed interval
        whenever the posterior is skewed.  Returns (low, high)."""
        self._check_finalized()
        if not 0.0 < mass < 1.0:
            raise ValueError("mass must be in (0, 1)")
        vals = self.values_numpy()
        flat = vals.reshape(self._length, -1)[:, 0] if vals.ndim > 1 else vals
        order = np.argsort(flat, kind="stable")
        sorted_vals = flat[order]
        cum = np.concatenate(
            [[0.0], np.cumsum(np.asarray(self._probs)[order])]
        )
        # for each left endpoint i, the smallest j with
        # cum[j] - cum[i] >= mass; pick the (i, j) of minimal width
        right = np.searchsorted(cum, cum[:-1] + mass)
        valid = right <= self._length
        if not valid.any():
            return float(sorted_vals[0]), float(sorted_vals[-1])
        lefts = np.nonzero(valid)[0]
        rights = right[lefts]
        widths = sorted_vals[rights - 1] - sorted_vals[lefts]
        k = int(np.argmin(widths))
        return float(sorted_vals[lefts[k]]), float(sorted_vals[rights[k] - 1])

    @property
    def min(self):
        vals = self.values_numpy()
        return vals.min(axis=0)

    @property
    def max(self):
        vals = self.values_numpy()
        return vals.max(axis=0)

    def log_prob(self, value, sum=False):
        raise NotImplementedError("Empirical does not define a density")

    def weights_numpy(self):
        self._check_finalized()
        return np.asarray(self._probs)

    def plot(self, *args, **kwargs):
        return self.plot_histogram(*args, **kwargs)

    def plot_histogram(
        self,
        figsize=(10, 5),
        xlabel=None,
        ylabel="Frequency",
        bins=30,
        log_xscale=False,
        log_yscale=False,
        file_name=None,
        show=False,
        density=True,
        ax=None,
        **kwargs,
    ):
        """Weighted histogram of the values (reference: empirical.py:889-918).

        Pass ``ax=`` (or ``ax=plt.gca()`` in a notebook) to draw onto an
        existing axes for overlays; figure creation/closing is then left to
        the caller."""
        if ax is not None:
            ax.hist(
                self.values_numpy(),
                weights=self.weights_numpy(),
                bins=bins,
                density=density,
                **kwargs,
            )
            return ax.figure
        if not show:
            import matplotlib

            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        ax.hist(
            self.values_numpy(),
            weights=self.weights_numpy(),
            bins=bins,
            density=density,
            **kwargs,
        )
        if log_xscale:
            ax.set_xscale("log")
        if log_yscale:
            ax.set_yscale("log")
        if xlabel:
            ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        if file_name is not None:
            fig.savefig(file_name, bbox_inches="tight")
        if show:
            plt.show()
        else:
            plt.close(fig)
        return fig

    def density_estimate(self, num_components=1):
        """Fit a GMM to the (resampled) values
        (reference: empirical.py:795-807)."""
        from sklearn.mixture import GaussianMixture
        from .normal import Normal
        from .mixture import Mixture

        n = min(self._length, 10000)
        samples = self.resample(n).values_numpy()
        if samples.ndim == 1:
            samples = samples[:, None]
        gmm = GaussianMixture(n_components=num_components)
        gmm.fit(samples)
        comps = [
            Normal(float(m[0]), float(math.sqrt(c[0][0])))
            for m, c in zip(gmm.means_, gmm.covariances_)
        ]
        return Mixture(comps, probs=gmm.weights_.astype(util.dtype()))

    # ------------------------------------------------------------------
    def __repr__(self):
        try:
            return (
                f"Empirical(name={self._name!r}, length={self._length}, "
                f"type={self._type.name}, ESS={self.effective_sample_size:.2f})"
            )
        except Exception:
            return f"Empirical(name={self._name!r}, length={self._length})"
