from combblas_spark.sources.fixtures import (  # noqa: F401
    sevenvertex,
    chain_star_forest,
    weighted_digraph,
)
from combblas_spark.sources.rmat import rmat_edges  # noqa: F401
from combblas_spark.sources.graphs import (  # noqa: F401
    SUPPLIER_OFFSET,
    NATION_OFFSET,
    build_graph,
    part_supplier_graph,
    nation_clique_graph,
    nation_star_graph,
    events_digraph,
)
from combblas_spark.sources.corpus import (  # noqa: F401
    build_vertices,
    build_edges_cooccurrence,
    synth_repo_files,
)
from combblas_spark.sources.clusters import (  # noqa: F401
    read_clusters,
    write_clusters,
)
from combblas_spark.sources.bucketed import (  # noqa: F401
    write_bucketed,
    read_bucketed,
)
from combblas_spark.sources.jsonl import (  # noqa: F401
    read_jsonl,
    write_jsonl,
)
