from .knn import assign_clusters, kmeans_centroids, knn_ivf  # noqa: F401
