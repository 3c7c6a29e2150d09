from .tables import load_table, register_tables, us  # noqa: F401
from .corpus import CORPUS, Query  # noqa: F401
from . import corpus_docs  # noqa: F401  (registers document-pipeline queries)
from . import corpus_ext  # noqa: F401  (set ops, rollup/cube, ANN, multimodal)
from . import corpus_subq  # noqa: F401  (subqueries, TPC-H join shapes)
