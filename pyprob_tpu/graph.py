"""Address-transition digraph over a trace distribution.

Counterpart of reference pyprob/graph.py:13-265: nodes are address ids
(plus START/END), edges weighted by trace weights; rendering emits GraphViz
DOT text directly (no pydotplus dependency) and invokes the ``dot`` binary
when available.  ``sample_execution`` random-walks the transition graph.
"""

from __future__ import annotations

import os
import random
import shutil
import subprocess

import numpy as np

from . import util
from .diagnostics import _trace_stats


class Node:
    def __init__(self, address_id, variable, weight):
        self.address_id = address_id
        self.variable = variable
        self.weight = weight
        self.outgoing_edges = []

    def add_outgoing_edge(self, node, weight):
        edge = Edge(self, node, weight)
        self.outgoing_edges.append(edge)
        return edge

    @property
    def color(self):
        if self.variable is None:
            return "black"
        if self.variable.observed:
            return "blue"
        if self.variable.tagged:
            return "green"
        if self.variable.control:
            return "red"
        return "gray"

    def __repr__(self):
        return f"Node({self.address_id}, weight: {self.weight})"


class Edge:
    def __init__(self, node_0, node_1, weight):
        self.node_0 = node_0
        self.node_1 = node_1
        self.weight = weight

    def __repr__(self):
        return (
            f"Edge({self.node_0.address_id} -> {self.node_1.address_id}, "
            f"weight: {self.weight})"
        )


class Graph:
    def __init__(
        self,
        trace_dist=None,
        base_graph=None,
        use_address_base=True,
        n_most_frequent=None,
        normalize_weights=True,
        min_address_count=None,
        exclude_addresses_regex=None,
    ):
        self.nodes = []
        self.edges = []
        self._use_address_base = use_address_base
        # reuse the base graph's address/trace ids so nodes correspond
        # between the two renderings (reference: graph.py:55-130 diffing)
        base_stats = getattr(base_graph, "_stats", None)
        reuse_addr = base_stats["address_stats"] if base_stats else None
        reuse_trace = base_stats["trace_stats"] if base_stats else None

        if trace_dist is None:
            return
        from .diagnostics import (
            _remove_addresses,
            _remove_addresses_below_count,
        )

        if exclude_addresses_regex is not None:
            trace_dist = _remove_addresses(trace_dist, exclude_addresses_regex)
        if min_address_count is not None:
            trace_dist = _remove_addresses_below_count(
                trace_dist, min_address_count
            )

        stats = _trace_stats(
            trace_dist,
            use_address_base=use_address_base,
            reuse_ids_from_address_stats=reuse_addr,
            reuse_ids_from_trace_stats=reuse_trace,
        )
        self._stats = stats
        address_stats = stats["address_stats"]
        self._address_ids = {
            a: s["address_id"] for a, s in address_stats.items()
        }

        start = Node("START", None, 1.0)
        end = Node("END", None, 0.0)
        self.add_node(start)
        self.add_node(end)
        nodes = {"START": start, "END": end}
        for address, s in address_stats.items():
            node = Node(s["address_id"], s["variable"], s["weight"])
            nodes[s["address_id"]] = node
            self.add_node(node)

        edge_weights = {}
        trace_stats = stats["trace_stats"]
        total_weight = sum(s["weight"] for s in trace_stats.values()) or 1.0
        for s in trace_stats.values():
            trace = s["example_trace"]
            w = s["weight"]
            chain = ["START"]
            for v in trace.variables:
                address = v.address_base if use_address_base else v.address
                if address in address_stats:
                    chain.append(address_stats[address]["address_id"])
            chain.append("END")
            for a, b in zip(chain[:-1], chain[1:]):
                edge_weights[(a, b)] = edge_weights.get((a, b), 0.0) + w
        for (a, b), w in edge_weights.items():
            edge = nodes[a].add_outgoing_edge(nodes[b], w)
            self.edges.append(edge)
        if normalize_weights:
            self.normalize_weights()
        if n_most_frequent is not None:
            keep_ids = {"START", "END"} | {
                s["address_id"]
                for s in sorted(
                    address_stats.values(), key=lambda x: -x["count"]
                )[:n_most_frequent]
            }
            self.nodes = [n for n in self.nodes if n.address_id in keep_ids]
            self.edges = [
                e
                for e in self.edges
                if e.node_0.address_id in keep_ids
                and e.node_1.address_id in keep_ids
            ]

    def add_node(self, node):
        self.nodes.append(node)

    def get_node(self, address_id):
        for n in self.nodes:
            if n.address_id == address_id:
                return n
        return None

    def add_edge(self, edge):
        self.edges.append(edge)

    def compute_normalized_weights(self):
        """Store normalized weights on ``weight_normalized`` fields without
        mutating the raw weights (reference: graph.py:141-154 — node weights
        normalized over the graph total, edge weights per source node)."""
        node_total = sum(n.weight for n in self.nodes)
        for node in self.nodes:
            edge_total = sum(e.weight for e in node.outgoing_edges)
            for e in node.outgoing_edges:
                e.weight_normalized = (
                    e.weight / edge_total if edge_total > 0 else e.weight
                )
            node.weight_normalized = (
                node.weight / node_total if node_total > 0 else node.weight
            )

    def normalize_weights(self):
        """Normalize each node's outgoing edge weights to sum to 1
        (transition probabilities, reference: graph.py:141-160)."""
        for node in self.nodes:
            total = sum(e.weight for e in node.outgoing_edges)
            if total > 0:
                for e in node.outgoing_edges:
                    e.weight = e.weight / total

    def trace_graphs(self):
        """Yield ``(trace_id, Graph)`` per trace type, each rendered against
        this graph as base so node ids line up (reference: graph.py:162-167)."""
        from .distributions import Empirical

        stats = getattr(self, "_stats", None)
        if not stats:
            return
        for s in stats["trace_stats"].values():
            sub = Graph(
                Empirical(values=[s["example_trace"]]),
                base_graph=self,
                use_address_base=self._use_address_base,
            )
            yield s["trace_id"], sub

    def render_to_graphviz(self, background_graph=None):
        """DOT source text (reference: graph.py:169-232 returns pydotplus
        data; here the raw DOT string — feed to ``dot`` or graphviz)."""
        return self.to_dot(background_graph)

    @property
    def addresses(self):
        return [n.address_id for n in self.nodes]

    def sample_execution(self, max_steps=10000):
        """Random walk START -> END over transition probabilities
        (reference: graph.py:254-262)."""
        node = self.get_node("START")
        path = [node]
        for _ in range(max_steps):
            if node is None or node.address_id == "END":
                break
            if not node.outgoing_edges:
                break
            weights = np.asarray([e.weight for e in node.outgoing_edges])
            if weights.sum() <= 0:
                break
            probs = weights / weights.sum()
            idx = int(util.get_rng().choice(len(probs), p=probs))
            node = node.outgoing_edges[idx].node_1
            path.append(node)
        return path

    def to_dot(self, background_graph=None):
        """Emit GraphViz DOT text (reference renders via pydotplus,
        graph.py:169-232; here raw DOT)."""
        lines = ["digraph trace_graph {", "  rankdir=TB;"]
        for node in self.nodes:
            label = node.address_id
            if node.variable is not None and node.variable.name:
                label += f"\\n{node.variable.name}"
            lines.append(
                f'  "{node.address_id}" [label="{label}", color={node.color}];'
            )
        for edge in self.edges:
            lines.append(
                f'  "{edge.node_0.address_id}" -> "{edge.node_1.address_id}" '
                f'[label="{edge.weight:.3f}", penwidth={max(0.5, 5 * edge.weight):.2f}];'
            )
        lines.append("}")
        return "\n".join(lines)

    def render_to_file(self, file_name, background_graph=None):
        dot = self.to_dot(background_graph)
        dot_file = file_name if file_name.endswith(".dot") else file_name + ".dot"
        with open(dot_file, "w") as f:
            f.write(dot)
        if shutil.which("dot") and not file_name.endswith(".dot"):
            ext = os.path.splitext(file_name)[1].lstrip(".") or "pdf"
            try:
                subprocess.run(
                    ["dot", f"-T{ext}", dot_file, "-o", file_name],
                    check=True,
                    capture_output=True,
                )
            except subprocess.CalledProcessError:
                pass
        return dot_file

    def __repr__(self):
        return f"Graph(nodes: {len(self.nodes)}, edges: {len(self.edges)})"
