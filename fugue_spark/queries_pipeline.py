"""Beyond-reference pipeline queries (dedup, similarity, text analysis).

Populated as the pipeline operators land; see fugue_spark/pipeline/.
"""

from __future__ import annotations
