from clusterindices_spark.functions.distances import cosine_sim, dot, l2, l2sq, norm

__all__ = ["cosine_sim", "dot", "l2", "l2sq", "norm"]
