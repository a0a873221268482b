"""pevit_tpu: TPU-native parameter-efficient adaptation framework for ViTs.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of eric-ai-lab/PEViT
(parameter-efficient CLIP adaptation benchmarked on the 20-dataset ELEVATER
suite): KAdaptation, LoRA, bottleneck adapters, Compacter, linear probing,
full fine-tuning and zero-shot evaluation, with the hyperparameter-sweep
trainer executed as vmapped trial batches on a TPU device mesh.
"""

__version__ = "0.1.0"
