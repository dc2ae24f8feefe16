"""TPU-native Faster R-CNN framework (JAX/Flax/XLA/Pallas rebuild of Kelicious/faster_rcnn)."""
__version__ = "0.1.0"
