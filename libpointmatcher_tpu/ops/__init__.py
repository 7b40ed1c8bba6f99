from .knn import knn_brute_force  # noqa: F401
