"""Training: full train model (G + Ds + VGG), optimizer groups, jitted step."""
