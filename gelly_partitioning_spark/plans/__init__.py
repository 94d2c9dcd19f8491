from .partitioning import degree_balanced_edges, partition_histogram

__all__ = ["degree_balanced_edges", "partition_histogram"]
