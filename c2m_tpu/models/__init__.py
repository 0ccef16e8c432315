"""Model modules: appearance encoder, sparse/dense motion, generator, discriminators."""
