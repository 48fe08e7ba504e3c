"""Spinglass community detection, deterministic zero-temperature limit
— the engine's counterpart of igraph_community_spinglass
(/root/reference/src/clustertool.cpp:98; Reichardt & Bornholdt,
"Statistical mechanics of community detection", PRE 74:016110 (2006)).

The reference minimizes the RB Potts Hamiltonian
    H = -Σ_ij (A_ij − γ p_ij) δ(σ_i, σ_j)
by simulated annealing over an RNG-dependent spin-update schedule; its
output is a sample, not a function of the input. For the configuration
null model p_ij = k_i k_j / 2m, minimizing H is exactly maximizing
resolution-γ modularity (RB paper §III), so the engine implements the
deterministic T→0 quench as multilevel γ-local-moving on the shared
louvain engine: synchronous greedy spin updates (each vertex adopts the
neighboring spin with the largest Hamiltonian decrease, min-id tie
break, splitmix half-activation damping against synchronous
oscillation), then contraction and further quenching on the coarse spin
graph — the T=0 analogue of the annealer's collective spin flips, which
a single-level quench cannot perform and without which the quench
freezes in fragmented local minima. Deterministic pure function of
(graph, gamma); quality gates (planted recovery, the γ-controlled
resolution behavior on a ring of cliques — the phenomenon the RB model
was built to expose) live in tests/test_spinglass.py.
"""

from __future__ import annotations

import dataclasses

import ray.data

from igraph_ray.graph import Graph
from igraph_ray.algorithms.louvain import louvain, louvain_pinned


@dataclasses.dataclass
class SpinglassResult:
    state: ray.data.Dataset  # (vertex, community) dense 0..k-1
    modularity: float        # plain (gamma=1) modularity of the labels
    sweeps: int


def spinglass_sweeps(
    graph: Graph,
    gamma_num: int = 3,
    gamma_den: int = 2,
    sweeps: int = 2,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Exactly ``sweeps`` synchronous T=0 spin-quench sweeps of the RB
    Potts model at the exact rational resolution gamma = num/den, from
    the all-singleton spin state (clustertool.cpp:98 greedy spin-update
    semantics, pinned for the driver oracle). The Hamiltonian-decrease
    comparison is the exact int64 quantity den·m2·k_vc − num·deg·vol_eff
    (gain·den·2m² — RB PRE 74:016110 §III equivalence with
    gamma-modularity), so a fixed SQL text replays it bit-for-bit.
    Returns (vertex, community) raw spin labels."""
    return louvain_pinned(graph, level_sweeps=(sweeps,),
                          num_partitions=num_partitions,
                          gamma_num=gamma_num, gamma_den=gamma_den)


def spinglass_quench(
    graph: Graph,
    gamma: float = 1.0,
    max_sweeps: int = 8,
    max_levels: int = 10,
    num_partitions: int = 8,
) -> SpinglassResult:
    """Deterministic T=0 spin quench of the RB Potts model at
    resolution ``gamma``; labels densified 0..k-1 by first appearance
    (min member vertex id), like the reference's membership vector."""
    res = louvain(graph, num_partitions=num_partitions,
                  max_sweeps=max_sweeps, max_levels=max_levels,
                  resolution=gamma)
    return SpinglassResult(state=res.state, modularity=res.modularity,
                           sweeps=res.sweeps)
