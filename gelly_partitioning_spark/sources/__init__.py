from .ann_store import PreparedIndex, load_prepared_index, save_prepared_index
from .corpus import extract_edges, synthesize_repo_files
from .edge_list import read_edge_list, write_edge_list
from .graph_store import PreparedGraph, load_prepared_graph, save_prepared_graph

__all__ = [
    "extract_edges",
    "synthesize_repo_files",
    "read_edge_list",
    "write_edge_list",
    "PreparedGraph",
    "load_prepared_graph",
    "save_prepared_graph",
    "PreparedIndex",
    "load_prepared_index",
    "save_prepared_index",
]
