"""Split-quality criteria.

Parity: reference ``efficient_trees/enums.py:8-14`` defines the same two
criteria; entropy is the default (``tree.py:27``).
"""

from enum import Enum


class Criterion(str, Enum):
    """Impurity criterion used to score candidate splits."""

    ENTROPY = "entropy"
    GINI = "gini"
