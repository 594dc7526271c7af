"""LLM-training-data pipeline queries (dedup, similarity, text
analysis, multimodal).  Filled in operator-by-operator; see
``operators/dedup.py``, ``operators/similarity.py``,
``operators/text.py``, ``operators/multimodal.py``.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
