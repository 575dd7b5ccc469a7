"""MagicDrive-TPU: a TPU-native multi-view conditional latent-diffusion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of cure-lab/MagicDrive:
ControlNet-conditioned Stable-Diffusion generation of the 6 surround camera views
of a driving scene, conditioned on text, camera pose, 3D bounding boxes and a BEV
semantic map, with cross-view attention for multi-view consistency.

Reference behavior citations use ``ref:`` prefixes and point into the upstream
repo layout (e.g. ``ref:magicdrive/networks/blocks.py:106``).
"""

__version__ = "0.1.0"
