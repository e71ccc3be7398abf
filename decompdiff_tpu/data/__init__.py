from decompdiff_tpu.data.batch import ComplexBatch, FullProtein
