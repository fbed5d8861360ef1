"""Example utilities (reference: examples/utils/utils.py — Timer + plot_tree).

matplotlib is not a dependency of this engine; ``plot_tree`` renders with it
when importable and otherwise falls back to an ASCII rendering on stdout, so
the examples run anywhere.
"""

from __future__ import annotations

import time
from typing import Any


class Timer:
    """Context-manager stopwatch (reference utils.py Timer)."""

    def __init__(self, name: str = ""):
        self.name = name

    def __enter__(self) -> "Timer":
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self.start
        label = f"[{self.name}] " if self.name else ""
        print(f"{label}elapsed: {self.elapsed:.3f}s")


def format_tree(node: dict[str, Any], indent: str = "") -> str:
    """ASCII rendering of the node-dict tree."""
    if node["type"] == "leaf":
        return f"{indent}leaf -> {node['value']}\n"
    head = (
        f"{indent}{node['feature']} <= {node['threshold']:.6g}"
        f"  (gain={node['information_gain']:.4f})\n"
    )
    return (
        head
        + format_tree(node["left"], indent + "  ")
        + format_tree(node["right"], indent + "  ")
    )


def plot_tree(tree: dict[str, Any], path: str) -> None:
    """Render the tree to ``path`` via matplotlib when available, else print
    the ASCII form (the reference's plot_tree draws with matplotlib,
    utils.py:30-98)."""
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        print(f"(matplotlib unavailable — ASCII tree instead of {path})")
        print(format_tree(tree), end="")
        return

    import matplotlib.pyplot as plt

    def draw(node, x, y, dx, ax):
        if node["type"] == "leaf":
            ax.text(x, y, f"leaf\n{node['value']}", ha="center",
                    bbox=dict(boxstyle="round", fc="lightgreen"))
            return
        ax.text(x, y, f"{node['feature']}\n<= {node['threshold']:.4g}",
                ha="center", bbox=dict(boxstyle="round", fc="lightblue"))
        for child, nx in [(node["left"], x - dx), (node["right"], x + dx)]:
            ax.plot([x, nx], [y - 0.02, y - 0.1 + 0.02], "k-", lw=0.8)
            draw(child, nx, y - 0.1, dx / 2, ax)

    fig, ax = plt.subplots(figsize=(14, 8))
    ax.axis("off")
    draw(tree, 0.5, 0.95, 0.24, ax)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    print(f"tree plot written to {path}")
