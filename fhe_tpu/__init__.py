"""fhe_tpu: a TPU-native FHE primitive library (JAX / XLA / Pallas).

Brand-new implementation with the capabilities of the reference C++ engine
luxcpp/fhe (OpenFHE-derived): TFHE/FHEW boolean gates with programmable
bootstrapping, CKKS/BGV/BFV RNS schemes, key switching, threshold multiparty
decryption, and batch APIs -- designed TPU-first (uint32 RNS arithmetic,
int8-MXU NTTs, batch/limb sharding over device meshes).
"""

__version__ = "0.1.0"
