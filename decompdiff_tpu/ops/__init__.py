from decompdiff_tpu.ops.knn import knn_neighbors
