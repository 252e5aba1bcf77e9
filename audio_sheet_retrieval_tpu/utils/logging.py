"""Console color helpers and model summaries.

Parity: reference:utils/plotting.py:8-27 (BColors) and
reference:utils/monitoring.py:10-34 (print_architecture).
"""

from __future__ import annotations

import jax
import numpy as np


class BColors:
    HEADER = "\033[95m"
    OKBLUE = "\033[94m"
    OKGREEN = "\033[92m"
    WARNING = "\033[93m"
    FAIL = "\033[91m"
    ENDC = "\033[0m"
    BOLD = "\033[1m"
    UNDERLINE = "\033[4m"

    def print_colored(self, string: str, color: str) -> str:
        return color + str(string) + BColors.ENDC


def count_params(pytree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(pytree))


def print_architecture(params, name: str = "model") -> str:
    """Layer table of a parameter pytree (analog of monitoring.py:10-34)."""
    lines = [f"architecture of {name}:"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        lines.append(f"  {key:<48} {str(leaf.shape):<20} {leaf.dtype}")
    lines.append(f"  total parameters: {count_params(params):,}")
    out = "\n".join(lines)
    print(out)
    return out
