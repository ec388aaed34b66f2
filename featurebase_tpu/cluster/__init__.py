from featurebase_tpu.cluster.cluster import Cluster
from featurebase_tpu.cluster.topology import ClusterSnapshot, Node

__all__ = ["Cluster", "ClusterSnapshot", "Node"]
