"""Variable and Trace records.

Counterpart of the reference's trace structures
(reference: pyprob/trace.py:9-199), array-framework-agnostic: ``value`` and
``log_prob`` may be python floats, numpy arrays (interpreter tier) or jnp
arrays with a leading particle batch dimension (compiled tier) — all the
aggregation below is plain ``+``/``sum`` that works for both.
"""

from __future__ import annotations

import copy
import pickle
from collections import Counter

import numpy as np


class Variable:
    def __init__(
        self,
        distribution=None,
        value=None,
        address_base=None,
        address=None,
        instance=None,
        log_prob=None,
        log_importance_weight=None,
        control=False,
        name=None,
        observed=False,
        reused=False,
        tagged=False,
        masked=False,
    ):
        self.distribution = distribution
        self.value = value
        self.address_base = address_base
        self.address = address
        self.instance = instance
        self.log_prob = log_prob
        self.log_importance_weight = log_importance_weight
        self.control = control
        self.name = name
        self.observable = ((not tagged) and (name is not None)) or observed
        self.observed = observed
        self.reused = reused
        self.tagged = tagged
        # sample(mask=False): structurally-inactive padding site — its
        # (prior-scored) value is exact marginalization for every engine;
        # IC proposes it from the prior and excludes it from the training
        # loss.  Consumers use getattr(v, "masked", False) for pickles
        # from before this flag existed.
        self.masked = masked

    def __repr__(self):
        return (
            "Variable(name:{}, observable:{}, observed:{}, tagged:{}, control:{}, "
            "address:{}, distribution:{}, value:{}, log_importance_weight:{}, "
            "log_prob:{})".format(
                getattr(self, "name", "Unknown"),
                getattr(self, "observable", "Unknown"),
                getattr(self, "observed", "Unknown"),
                getattr(self, "tagged", "Unknown"),
                getattr(self, "control", "Unknown"),
                getattr(self, "address", "Unknown"),
                getattr(self, "distribution", "Unknown"),
                getattr(self, "value", "Unknown"),
                getattr(self, "log_importance_weight", "Unknown"),
                getattr(self, "log_prob", "Unknown"),
            )
        )

    def clone(self):
        return copy.deepcopy(self)

    def to(self, device=None, *args, **kwargs):
        """Migration no-op (reference Variable.to(device); JAX placement
        is backend-managed)."""
        return self

    def __hash__(self):
        # Hash raw array bytes rather than stringified contents: Empirical
        # dedup paths (combine_duplicates) hash every variable, and building
        # a python-list string is ~100x the cost of hashing the buffer for
        # large tensor values.
        v = self.value
        try:
            a = np.asarray(v)
            vh = hash((a.shape, a.dtype.str, a.tobytes()))
        except Exception:
            vh = hash(str(v))
        return hash(
            (self.address or "", vh, self.control, self.observed, self.tagged)
        )

    def __eq__(self, other):
        if not isinstance(other, Variable):
            return NotImplemented
        if (
            (self.address or "") != (other.address or "")
            or self.control != other.control
            or self.observed != other.observed
            or self.tagged != other.tagged
        ):
            return False
        try:
            a = np.asarray(self.value)
            b = np.asarray(other.value)
            return (
                a.shape == b.shape
                and a.dtype == b.dtype
                and bool(np.array_equal(a, b))
            )
        except Exception:
            return str(self.value) == str(other.value)


class Trace:
    def __init__(self):
        self.variables = []
        self.variables_controlled = []
        self.variables_uncontrolled = []
        self.variables_observed = []
        self.variables_observable = []
        self.variables_tagged = []
        self.variables_dict_address = {}
        self.variables_dict_address_base = {}
        self.named_variables = {}
        self.result = None
        self.log_prob = 0.0
        self.log_prob_observed = 0.0
        self.log_importance_weight = 0.0
        self.length = 0
        self.length_controlled = 0
        self.execution_time_sec = None

    def __repr__(self):
        return (
            "Trace(variables:{:,}, controlled:{:,}, observed:{}, log_prob:{}, "
            "log_importance_weight:{})".format(
                self.length,
                self.length_controlled,
                len(self.variables_observed)
                if hasattr(self, "variables_observed")
                else "Unknown",
                self.log_prob,
                self.log_importance_weight,
            )
        )

    def add(self, variable):
        self.variables.append(variable)
        self.variables_dict_address[variable.address] = variable
        self.variables_dict_address_base[variable.address_base] = variable

    def end(self, result, execution_time_sec):
        """Finalize: compute aggregate log-probs and category lists
        (reference: trace.py:106-125)."""
        self.result = result
        self.execution_time_sec = execution_time_sec
        for variable in self.variables:
            if variable.name is not None:
                self.named_variables[variable.name] = variable
            if variable.control:
                self.variables_controlled.append(variable)
        self.variables_uncontrolled = [
            v
            for v in self.variables
            if (not v.control) and (not v.observed) and (not v.tagged)
        ]
        self.variables_observed = [v for v in self.variables if v.observed]
        self.variables_observable = [v for v in self.variables if v.observable]
        self.variables_tagged = [v for v in self.variables if v.tagged]
        self.log_prob = sum(
            np.sum(v.log_prob)
            for v in self.variables
            if (v.control or v.observed) and v.log_prob is not None
        )
        self.log_prob_observed = sum(
            np.sum(v.log_prob)
            for v in self.variables_observed
            if v.log_prob is not None
        )
        self.length = len(self.variables)
        self.length_controlled = len(self.variables_controlled)
        for variable in self.variables:
            if variable.log_importance_weight is not None:
                self.log_importance_weight = (
                    self.log_importance_weight + variable.log_importance_weight
                )

    def rollback(self, marker):
        """Discard variables added after ``marker`` (= an earlier
        ``len(trace.variables)``).  Replacement semantics for rejection
        loops: a retried attempt overwrites the previous attempt's records
        so addresses stay stable across attempts (the pyprob_cpp family's
        ``replace=true`` mode; cf. the reference's
        test_gum_marsaglia_replacement simulator)."""
        if marker >= len(self.variables):
            return
        del self.variables[marker:]
        self.variables_dict_address = {
            v.address: v for v in self.variables
        }
        self.variables_dict_address_base = {
            v.address_base: v for v in self.variables
        }

    def last_instance(self, address_base):
        if address_base in self.variables_dict_address_base:
            return self.variables_dict_address_base[address_base].instance
        return 0

    def address_counts(self, use_address_base=True):
        if use_address_base:
            addresses = [v.address_base for v in self.variables]
        else:
            addresses = [v.address for v in self.variables]
        return Counter(addresses)

    def trace_hash(self, controlled_only=True):
        """Hash of the controlled-address sequence, used for rectangular
        sub-batching (reference: nn/dataset.py:21-47)."""
        vs = self.variables_controlled if controlled_only else self.variables
        return "".join(v.address for v in vs)

    def clone(self):
        return copy.deepcopy(self)

    def to(self, device=None, *args, **kwargs):
        """Migration no-op (reference Trace.to(device) moves variable
        tensors between cpu/cuda; JAX placement is backend-managed)."""
        return self

    def variable_sizes(self):
        vars_sorted = sorted(
            self.variables, key=lambda v: len(pickle.dumps(v)), reverse=True
        )
        return vars_sorted, [len(pickle.dumps(v)) for v in vars_sorted]

    def __len__(self):
        return self.length

    def __hash__(self):
        # Order-sensitive: hashing the TUPLE of variable hashes (not their
        # sum) so permutations of the same variable set don't collide —
        # a collision here would let value-level dedup silently merge two
        # distinct traces.
        return hash(tuple(hash(v) for v in self.variables))

    def __eq__(self, other):
        if not isinstance(other, Trace):
            return NotImplemented
        if len(self.variables) != len(other.variables):
            return False
        return all(a == b for a, b in zip(self.variables, other.variables))

    def named_value(self, name):
        """The value(s) recorded under ``name``: the single variable's
        value normally; when a name repeats (a MarkovModel's per-step
        observe, one site per t) the STACKED sequence of all its values
        in execution order — what the observe embedding must see, and
        the shape the user passes at inference ([T, ...])."""
        vs = [v for v in self.variables if v.name == name]
        if not vs:
            raise RuntimeError(
                f"Trace does not include variable with name: {name}"
            )
        if len(vs) == 1:
            return vs[0].value
        import numpy as _np

        return _np.stack([_np.asarray(v.value) for v in vs])

    def __getitem__(self, variable_name):
        if variable_name in self.named_variables:
            return self.named_variables[variable_name].value
        raise RuntimeError(
            f"Trace does not include variable with name: {variable_name}"
        )

    def __contains__(self, variable_name):
        return variable_name in self.named_variables
