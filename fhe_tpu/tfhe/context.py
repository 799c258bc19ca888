"""BinFHE context facade -- the TPU analogue of the reference's
BinFHEContext (/root/reference/src/binfhe/include/binfhecontext.h:80).

Unlike the reference's stateful god-object, this context is a thin wrapper
over pure jittable functions: parameters are static Python data, keys are
device pytrees, and every Eval* accepts arbitrarily batched ciphertexts
(the batch axis is the TPU throughput axis, reference binfhe-batch.h's
design goal made the default).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax

from .params import TfheParams, Method, Gate, make_params
from . import lwe, rgsw, boot


@dataclasses.dataclass
class BinFheContext:
    params: TfheParams
    ntt_impl: str | None = None   # None = auto (MXU on TPU)

    # -- construction -------------------------------------------------------
    @classmethod
    def generate(cls, param_set: str = "STD128",
                 method: Method | str | None = None) -> "BinFheContext":
        """method=None auto-selects from the paramset name (*_LMKCDEY
        sets get the LMKCDEY accumulator; everything else GINX); an
        explicit incompatible method raises, mirroring the reference's
        isMethodCompatible throw (binfhecontext.cpp:66)."""
        method = Method[method] if isinstance(method, str) else method
        return cls(params=make_params(param_set, method))

    # -- key generation -----------------------------------------------------
    def key_gen(self, rng: np.random.Generator | int = 0) -> lwe.LweSecretKey:
        rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
        return lwe.keygen(self.params, rng)

    def key_gen_n(self, rng: np.random.Generator | int = 0) -> lwe.LweSecretKey:
        rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
        return lwe.keygen(self.params, rng, dim=self.params.N)

    def bt_key_gen(self, sk: lwe.LweSecretKey,
                   rng: np.random.Generator | int = 0,
                   sk_n: lwe.LweSecretKey | None = None):
        """BTKeyGen (binfhecontext.h:266): refresh + switching keys,
        per the context's blind-rotation method."""
        from . import acc as accmod
        rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
        if sk_n is None:
            sk_n = lwe.keygen(self.params, rng, dim=self.params.N)
        ksk = lwe.key_switch_gen(self.params, sk, sk_n, rng)
        if self.params.method == Method.GINX:
            if self.params.moduli_rns:
                from . import rgsw_rns
                return rgsw.BootstrapKey(
                    bsk=rgsw_rns.bsk_gen_rns(self.params, sk, sk_n, rng),
                    ksk=ksk)
            bsk = rgsw.bsk_gen(self.params, sk, sk_n, rng)
            return rgsw.BootstrapKey(
                bsk=bsk, ksk=ksk,
                bsk_shoup=rgsw.shoup_dual(bsk, self.params.Q))
        if self.params.method == Method.AP:
            return accmod.DmKey(bsk=accmod.dm_bsk_gen(self.params, sk, sk_n,
                                                      rng), ksk=ksk)
        rg, auto = accmod.lmkcdey_key_gen(self.params, sk, sk_n, rng)
        return accmod.LmkcdeyKey(rgsw=rg, auto=auto, ksk=ksk)

    def key_gen_pair(self, rng: np.random.Generator | int = 0):
        """KeyGenPair (binfhecontext.h:182-196): (sk_n, sk_N, pk) with the
        public key over the ring dimension N."""
        rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
        sk = lwe.keygen(self.params, rng)
        sk_n = lwe.keygen(self.params, rng, dim=self.params.N)
        pk = lwe.pub_key_gen(self.params, sk_n, rng)
        return sk, sk_n, pk

    def encrypt_pk(self, pk: lwe.LwePublicKey, m,
                   rng: np.random.Generator | int = 0, p: int = 4,
                   ksk: lwe.LweSwitchingKey | None = None
                   ) -> lwe.LweCiphertext:
        """Public-key encryption (Encrypt with LWEPublicKey,
        binfhecontext.h:215): dimension-N ciphertexts at modulus Q; pass
        the bootstrap key's ksk to switch down to (n, q) for gates."""
        rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
        ct = lwe.encrypt_pk(self.params, pk, m, rng, p)
        if ksk is not None:
            ct = lwe.switch_ct_to_qn(self.params, ksk, ct)
        return ct

    # -- encryption ---------------------------------------------------------
    def encrypt(self, sk: lwe.LweSecretKey, m,
                rng: np.random.Generator | int = 0, p: int = 4,
                modulus: int | None = None) -> lwe.LweCiphertext:
        rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
        return lwe.encrypt(self.params, sk, m, rng, p, modulus)

    def decrypt(self, sk: lwe.LweSecretKey, ct: lwe.LweCiphertext,
                p: int | None = None) -> jax.Array:
        return lwe.decrypt(self.params, sk, ct, p)

    # -- gates --------------------------------------------------------------
    def eval_bin_gate(self, key: rgsw.BootstrapKey, gate: Gate | str,
                      ct1: lwe.LweCiphertext, ct2: lwe.LweCiphertext,
                      extended: bool = False) -> lwe.LweCiphertext:
        gate = Gate[gate] if isinstance(gate, str) else gate
        if gate == Gate.CMUX:
            raise ValueError("CMUX takes 3 inputs; use eval_cmux")
        if self.params.moduli_rns:
            from . import rgsw_rns
            return rgsw_rns.eval_bin_gate_rns(self.params, key, gate,
                                              ct1, ct2)
        return boot.eval_bin_gate(self.params, key, gate, ct1, ct2,
                                  extended, self.ntt_impl)

    def eval_bin_gate_multi(self, key: rgsw.BootstrapKey, gate: Gate | str,
                            cts, extended: bool = False) -> lwe.LweCiphertext:
        gate = Gate[gate] if isinstance(gate, str) else gate
        return boot.eval_bin_gate_multi(self.params, key, gate, list(cts),
                                        extended, self.ntt_impl)

    def eval_cmux(self, key: rgsw.BootstrapKey, ct0, ct1, ct_sel):
        """CMUX via 3 NANDs (EvalBinGate vector overload :178-183)."""
        nand = lambda a, b: self.eval_bin_gate(key, Gate.NAND, a, b)
        ct_nand1 = nand(ct0, self.eval_not(ct_sel))
        ct_nand2 = nand(ct1, ct_sel)
        return nand(ct_nand1, ct_nand2)

    def eval_not(self, ct: lwe.LweCiphertext) -> lwe.LweCiphertext:
        return lwe.not_(ct)

    def eval_constant(self, value, batch: int | None = None
                      ) -> lwe.LweCiphertext:
        """Trivial (noiseless, a=0) encryption of a constant bit
        (EvalConstant -> NoiselessEmbedding, lwe-pke.cpp:377-381):
        b = (q/4)*m, a = 0.  Useful as a public input to gate circuits."""
        import jax.numpy as jnp
        q, n = self.params.q, self.params.n
        v = np.asarray(value, dtype=np.int64)
        if batch is not None and v.ndim == 0:
            v = np.full(batch, int(v))
        b = ((v % 4) * (q // 4)).astype(np.uint32)
        a = jnp.zeros(v.shape + (n,), dtype=jnp.uint32)
        return lwe.LweCiphertext(a=a, b=jnp.asarray(b), modulus=q, pt_mod=4)

    def key_switch_gen(self, sk: lwe.LweSecretKey, sk_n: lwe.LweSecretKey,
                       rng: np.random.Generator | int = 0):
        """KeySwitchGen (binfhecontext.h): LWE N->n switching key."""
        rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
        return lwe.key_switch_gen(self.params, sk, sk_n, rng)

    def switch_ct_to_qn(self, ksk, ct: lwe.LweCiphertext
                        ) -> lwe.LweCiphertext:
        """SwitchCTtoqn (binfhecontext.h / lwe-pke.cpp:170): ModSwitch ->
        KeySwitch -> ModSwitch an extended (N, Q) ciphertext to (n, q)."""
        return lwe.switch_ct_to_qn(self.params, ksk, ct)

    def bootstrap(self, key: rgsw.BootstrapKey, ct: lwe.LweCiphertext,
                  extended: bool = False) -> lwe.LweCiphertext:
        return boot.bootstrap(self.params, key, ct, extended, self.ntt_impl)

    # -- functional bootstrapping (eprint 2021/1337) -------------------------
    def generate_lut(self, f, p: int) -> "np.ndarray":
        from . import funcboot
        return funcboot.generate_lut(f, p, self.params.q)

    def eval_func(self, key, ct, lut) -> lwe.LweCiphertext:
        from . import funcboot
        return funcboot.eval_func(self.params, key, ct, lut,
                                  ntt_impl=self.ntt_impl)

    def eval_floor(self, key, ct, roundbits: int = 0) -> lwe.LweCiphertext:
        from . import funcboot
        return funcboot.eval_floor(self.params, key, ct,
                                   roundbits=roundbits, ntt_impl=self.ntt_impl)

    def eval_sign(self, key, ct, scheme_switch: bool = False
                  ) -> lwe.LweCiphertext:
        from . import funcboot
        return funcboot.eval_sign(self.params, key, ct,
                                  scheme_switch=scheme_switch,
                                  ntt_impl=self.ntt_impl)

    def eval_decomp(self, key, ct) -> list:
        from . import funcboot
        return funcboot.eval_decomp(self.params, key, ct,
                                    ntt_impl=self.ntt_impl)

    @property
    def max_plaintext_space(self) -> int:
        """q / (2*beta) (binfhecontext.h:436-439)."""
        from . import funcboot
        return self.params.q // (2 * funcboot.BETA)
