"""croawl_spark — a from-scratch PySpark-native engine with the query and
data-processing capabilities of the ``dissemin/croawl`` crawler.

Architecture (SURVEY.md): everything is declared through the DataFrame/SQL
API so Catalyst/Tungsten choose physical strategy; Python appears only at
four sanctioned Arrow-vectorized boundaries (URL canonicalization, synthetic
fetch, span extraction, AMQ filter build/probe).

NOTE ON PROVENANCE: ``/root/reference`` was empty in this sandbox at both
survey and build time (SURVEY.md §0), so no reference file:line citations are
possible; semantics are pinned by BASELINE.json (driver spec) + SURVEY.md and
enforced by the in-repo single-process oracle simulator (tests/oracle_sim.py).
"""

__version__ = "0.1.0"
