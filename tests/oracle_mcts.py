"""Dict-of-nodes MCTS test oracle with reference semantics.

An independent, host-side re-statement of the reference search contract
(/root/reference/src/mcts.py): PUCT with q=0 FPU, sqrt(max(1,N)) parent
term, legal-mask prior renormalization, per-ply sign flip, terminal value
backprop. Arithmetic runs in a configurable dtype, in the same operation
order as the on-device search.

dtype=np.float64 is the robust parity mode: at 64-bit precision any
op-order rounding differences (~1e-16) cannot flip a PUCT comparison except
on structural ties, and ties break to the lowest action index on both sides
(children iterate in ascending action order, matching jnp.argmax first-max).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import numpy as np

from alphazero_tpu.env import OracleGame


class ONode:
    __slots__ = ("visit", "vsum", "prior", "children")

    def __init__(self, prior):
        self.visit = 0
        self.vsum = prior * 0
        self.prior = prior
        self.children: Dict[int, "ONode"] = {}

    @property
    def expanded(self) -> bool:
        return bool(self.children)


class OracleMCTS:
    """eval_fn(game) -> (policy_weights (192,) — may be unnormalized,
    value from the mover's perspective)."""

    def __init__(self, eval_fn: Callable, num_simulations: int,
                 c_puct: float = 1.5, dtype=np.float32,
                 fpu_reduction: float = 0.0):
        self.eval_fn = eval_fn
        self.num_simulations = num_simulations
        self.D = dtype
        self.c_puct = dtype(c_puct)
        # 0.0 = reference default (q=0 for unvisited); > 0 enables the
        # reference's commented-out FPU formula q = parent_Q - reduction
        # (mcts.py:290-298), mirroring SearchSpec.fpu_reduction.
        self.fpu_reduction = dtype(fpu_reduction)

    def search(self, game: OracleGame, noise: np.ndarray | None = None,
               root: ONode | None = None) -> ONode:
        """``root`` continues from a reused subtree (reference tree reuse,
        parallel_trainer.py:194-198): its visits/values/children persist
        and noise mixes into its existing priors (mcts.py:128-144)."""
        D = self.D
        if root is None:
            root = ONode(D(0))
        if not root.expanded and not game.is_terminal():
            self._expand(root, game)
        if noise is not None and root.expanded:
            self._mix_noise(root, noise)

        for _ in range(self.num_simulations):
            node, g, path = root, game.clone(), [root]
            while node.expanded:
                action, node = self._select(node)
                g.step_action(action)
                path.append(node)
            if g.is_terminal():
                value = D(g.get_reward() if g.turn == 1 else -g.get_reward())
            else:
                weights, value = self.eval_fn(g)
                self._expand(node, g, weights)
            self._backprop(path, D(value))
        return root

    def _expand(self, node: ONode, game: OracleGame,
                weights: np.ndarray | None = None) -> None:
        D = self.D
        if weights is None:
            weights, _ = self.eval_fn(game)
        legal = game.get_legal_action_mask()
        masked = np.where(legal, weights.astype(D), D(0)).astype(D)
        total = D(masked.sum(dtype=D))
        n_legal = max(int(legal.sum()), 1)
        for a in np.flatnonzero(legal):
            prior = masked[a] / total if total > 0 else D(1) / D(n_legal)
            node.children[int(a)] = ONode(D(prior))

    def _select(self, node: ONode) -> Tuple[int, ONode]:
        D = self.D
        sqrt_parent = np.sqrt(D(max(1, node.visit)))
        # same scalar-combined order as the device search (_puct_scores)
        cs = self.c_puct * sqrt_parent
        if self.fpu_reduction:
            parent_q = (D(node.vsum / D(node.visit)) if node.visit > 0
                        else D(0))
            fpu_q = D(parent_q - self.fpu_reduction)
        else:
            fpu_q = D(0)
        best_score, best_a, best_c = -np.inf, -1, None
        for a in sorted(node.children):  # ascending action order
            ch = node.children[a]
            if ch.visit == 0:
                q = fpu_q
            else:
                q = D(-(ch.vsum / D(ch.visit)))
            u = ch.prior * cs / D(1 + ch.visit)
            score = q + u
            if score > best_score:
                best_score, best_a, best_c = score, a, ch
        return best_a, best_c

    def _mix_noise(self, node: ONode, noise: np.ndarray) -> None:
        D = self.D
        eps = D(0.25)
        for a, ch in node.children.items():
            ch.prior = (D(1) - eps) * ch.prior + eps * D(noise[a])

    def _backprop(self, path: List[ONode], value) -> None:
        D = self.D
        v = D(value)
        for node in reversed(path):
            node.visit += 1
            node.vsum = D(node.vsum + v)
            v = D(-v)

    @staticmethod
    def visit_counts(root: ONode, num_actions: int = 192) -> np.ndarray:
        out = np.zeros(num_actions, np.int32)
        for a, ch in root.children.items():
            out[a] = ch.visit
        return out
