from puregraphdb_spark.functions.vector import cosine_similarity, dot, l2_norm

__all__ = ["cosine_similarity", "dot", "l2_norm"]
