"""dino_tracker_tpu — a TPU-native JAX/XLA/Pallas rebuild of DINO-Tracker.

Self-supervised point tracking in a single video via per-video test-time
training, redesigned for TPU: jitted functional train steps, Pallas
flash-attention ViT feature extraction, sharded frame-pair affinity sweeps,
and pjit/mesh scale-out. Behavior spec: /root/reference (AssafSinger94/
dino-tracker); architecture: ours.
"""

__version__ = "0.1.0"
