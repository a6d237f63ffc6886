"""music_dedupe_spark — a from-scratch PySpark-native entity-resolution engine.

Re-creates the query semantics of the reference (gefl24/music-dedupe, a
single-node FastAPI music deduplicator) as an idiomatic, cluster-scale
PySpark pipeline: blocking -> pairwise scoring -> transitive clustering ->
survivorship, over a table of source-code files
``files(repo, path, commit, lang, content)``.

Nothing here is a port: the reference is imperative single-process Python
(see SURVEY.md for the full operator inventory with file:line citations);
this package expresses every operator as DataFrame/Catalyst plans plus
Arrow-vectorized pandas UDFs. No per-row Python anywhere in the hot path.
"""

__version__ = "0.1.0"

from music_dedupe_spark.session import get_spark  # noqa: F401
