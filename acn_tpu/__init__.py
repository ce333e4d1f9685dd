"""acn_tpu — TPU-native adaptive city-scale NeRF framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of
``psklavos1/adaptive-city-nerf`` (spatially-modular meta-NeRF for emergency
awareness): K Voronoi-cell Instant-NGP experts with soft boundary routing,
meta-continual training (MAML / FoMAML / Reptile), occupancy-guided volume
rendering, and online test-time adaptation — all designed TPU-first:

* networks are pure functions over parameter *pytrees* (no module system),
  so MAML fast weights are just transformed pytrees and ``jax.grad`` composes;
* the K experts are *stacked* along a leading axis and vmapped / sharded over
  a mesh ``expert`` axis instead of Python loops over ``nn.ModuleList``;
* occupancy ray marching uses static-shape masked sample layouts
  (``lax``-friendly) instead of CUDA ragged packed tensors;
* hot encodings (multiresolution hash grid) have a pure-``jnp`` oracle and a
  Pallas TPU kernel.
"""

__version__ = "0.1.0"
