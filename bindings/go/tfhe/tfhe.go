// Package tfhe: Go bindings for the FULL fhe_tpu gate-evaluation C API.
//
// The reference's go/tfhe package (go/tfhe/context.go) binds
// BinFHEContext through a cgo bridge.  Here the same Go surface rides
// libfhecapi.so (fhe_tpu/native/capi.cpp), which embeds CPython and
// drives the JAX/TPU compute path in-process — so Go programs get real
// bootstrapped gates, not just client-side crypto.
//
// Build: python -c "from fhe_tpu.native import capi; capi.get_lib()"
// (auto-compiles libfhecapi.so), then
//   CGO_LDFLAGS="-L<repo>/fhe_tpu/native -lfhecapi -lpython3.12" \
//   FHE_TPU_PATH=<repo> go build ./...
// (no Go toolchain ships in this repo's CI image; the identical C ABI
// is covered by tests/test_capi.py.)
package tfhe

/*
#cgo LDFLAGS: -lfhecapi
#include <stdint.h>
#include <stdlib.h>

typedef struct LuxFheContext LuxFheContext;
typedef struct LuxFheSecretKey LuxFheSecretKey;
typedef struct LuxFhePublicKey LuxFhePublicKey;
typedef struct LuxFheBootstrapKey LuxFheBootstrapKey;
typedef struct LuxFheCiphertext LuxFheCiphertext;

const char* lux_fhe_version(void);
int lux_fhe_has_gpu(void);
const char* lux_fhe_strerror(int err);
int lux_fhe_context_new(const char* param_set, const char* method, LuxFheContext** out);
void lux_fhe_context_free(LuxFheContext* ctx);
int64_t lux_fhe_context_n(LuxFheContext* ctx);
int64_t lux_fhe_context_ring_dim(LuxFheContext* ctx);
int64_t lux_fhe_context_modulus(LuxFheContext* ctx);
int lux_fhe_keygen_secret(LuxFheContext* ctx, uint64_t seed, LuxFheSecretKey** out);
int lux_fhe_keygen_bootstrap(LuxFheContext* ctx, LuxFheSecretKey* sk, LuxFheBootstrapKey** out);
int lux_fhe_keygen_public(LuxFheContext* ctx, LuxFheSecretKey* sk, LuxFhePublicKey** out);
void lux_fhe_secretkey_free(LuxFheSecretKey* k);
void lux_fhe_publickey_free(LuxFhePublicKey* k);
void lux_fhe_bootstrapkey_free(LuxFheBootstrapKey* k);
int lux_fhe_encrypt(LuxFheContext* ctx, LuxFheSecretKey* sk, int plaintext, LuxFheCiphertext** out);
int lux_fhe_encrypt_pk(LuxFheContext* ctx, LuxFhePublicKey* pk, LuxFheSecretKey* rng_src, int plaintext, LuxFheCiphertext** out);
int lux_fhe_decrypt(LuxFheContext* ctx, LuxFheSecretKey* sk, LuxFheCiphertext* ct, int* plaintext);
void lux_fhe_ciphertext_free(LuxFheCiphertext* ct);
int lux_fhe_ciphertext_clone(LuxFheCiphertext* src, LuxFheCiphertext** dst);
int lux_fhe_and(LuxFheContext* ctx, LuxFheBootstrapKey* bsk, LuxFheCiphertext* a, LuxFheCiphertext* b, LuxFheCiphertext** out);
int lux_fhe_or(LuxFheContext* ctx, LuxFheBootstrapKey* bsk, LuxFheCiphertext* a, LuxFheCiphertext* b, LuxFheCiphertext** out);
int lux_fhe_xor(LuxFheContext* ctx, LuxFheBootstrapKey* bsk, LuxFheCiphertext* a, LuxFheCiphertext* b, LuxFheCiphertext** out);
int lux_fhe_nand(LuxFheContext* ctx, LuxFheBootstrapKey* bsk, LuxFheCiphertext* a, LuxFheCiphertext* b, LuxFheCiphertext** out);
int lux_fhe_nor(LuxFheContext* ctx, LuxFheBootstrapKey* bsk, LuxFheCiphertext* a, LuxFheCiphertext* b, LuxFheCiphertext** out);
int lux_fhe_xnor(LuxFheContext* ctx, LuxFheBootstrapKey* bsk, LuxFheCiphertext* a, LuxFheCiphertext* b, LuxFheCiphertext** out);
int lux_fhe_not(LuxFheContext* ctx, LuxFheCiphertext* ct, LuxFheCiphertext** out);
int lux_fhe_mux(LuxFheContext* ctx, LuxFheBootstrapKey* bsk, LuxFheCiphertext* sel, LuxFheCiphertext* a, LuxFheCiphertext* b, LuxFheCiphertext** out);
int lux_fhe_bootstrap(LuxFheContext* ctx, LuxFheBootstrapKey* bsk, LuxFheCiphertext* ct, LuxFheCiphertext** out);
int lux_fhe_ciphertext_marshal(LuxFheCiphertext* ct, uint8_t** data, int64_t* len);
int lux_fhe_ciphertext_unmarshal(const uint8_t* data, int64_t len, LuxFheCiphertext** out);
int lux_fhe_secretkey_marshal(LuxFheSecretKey* sk, uint8_t** data, int64_t* len);
int lux_fhe_secretkey_unmarshal(const uint8_t* data, int64_t len, LuxFheSecretKey** out);
void lux_fhe_bytes_free(uint8_t* data);
*/
import "C"
import (
	"errors"
	"runtime"
	"unsafe"
)

// Context wraps a BinFHE context (named paramset + method).
type Context struct{ ptr *C.LuxFheContext }

// SecretKey, PublicKey, BootstrapKey, Ciphertext are opaque handles.
type SecretKey struct{ ptr *C.LuxFheSecretKey }
type PublicKey struct{ ptr *C.LuxFhePublicKey }
type BootstrapKey struct{ ptr *C.LuxFheBootstrapKey }
type Ciphertext struct{ ptr *C.LuxFheCiphertext }

// Ptr exposes the raw C handle for cross-package composition (e.g. the
// threshold package's KeyGen/Decrypt take these as unsafe.Pointer).
func (c *Context) Ptr() unsafe.Pointer    { return unsafe.Pointer(c.ptr) }
func (k *SecretKey) Ptr() unsafe.Pointer  { return unsafe.Pointer(k.ptr) }
func (ct *Ciphertext) Ptr() unsafe.Pointer { return unsafe.Pointer(ct.ptr) }

func ckErr(rc C.int) error {
	if rc == 0 {
		return nil
	}
	return errors.New(C.GoString(C.lux_fhe_strerror(rc)))
}

// Version returns the C ABI version string.
func Version() string { return C.GoString(C.lux_fhe_version()) }

// HasAccelerator reports whether a TPU backend is live.
func HasAccelerator() bool { return C.lux_fhe_has_gpu() != 0 }

// NewContext creates a context, e.g. NewContext("STD128", "GINX").
func NewContext(paramSet, method string) (*Context, error) {
	cp, cm := C.CString(paramSet), C.CString(method)
	defer C.free(unsafe.Pointer(cp))
	defer C.free(unsafe.Pointer(cm))
	var out *C.LuxFheContext
	if err := ckErr(C.lux_fhe_context_new(cp, cm, &out)); err != nil {
		return nil, err
	}
	ctx := &Context{ptr: out}
	runtime.SetFinalizer(ctx, func(c *Context) { C.lux_fhe_context_free(c.ptr) })
	return ctx, nil
}

// N / RingDim / Modulus expose the lattice parameters.
func (c *Context) N() int64       { return int64(C.lux_fhe_context_n(c.ptr)) }
func (c *Context) RingDim() int64 { return int64(C.lux_fhe_context_ring_dim(c.ptr)) }
func (c *Context) Modulus() int64 { return int64(C.lux_fhe_context_modulus(c.ptr)) }

// KeyGen generates the LWE secret key pair (seed 0 = nondeterministic).
func (c *Context) KeyGen(seed uint64) (*SecretKey, error) {
	var out *C.LuxFheSecretKey
	if err := ckErr(C.lux_fhe_keygen_secret(c.ptr, C.uint64_t(seed), &out)); err != nil {
		return nil, err
	}
	k := &SecretKey{ptr: out}
	runtime.SetFinalizer(k, func(k *SecretKey) { C.lux_fhe_secretkey_free(k.ptr) })
	return k, nil
}

// BTKeyGen generates the bootstrapping (refresh + switching) keys.
func (c *Context) BTKeyGen(sk *SecretKey) (*BootstrapKey, error) {
	var out *C.LuxFheBootstrapKey
	if err := ckErr(C.lux_fhe_keygen_bootstrap(c.ptr, sk.ptr, &out)); err != nil {
		return nil, err
	}
	k := &BootstrapKey{ptr: out}
	runtime.SetFinalizer(k, func(k *BootstrapKey) { C.lux_fhe_bootstrapkey_free(k.ptr) })
	return k, nil
}

// PubKeyGen derives an LWE public key.
func (c *Context) PubKeyGen(sk *SecretKey) (*PublicKey, error) {
	var out *C.LuxFhePublicKey
	if err := ckErr(C.lux_fhe_keygen_public(c.ptr, sk.ptr, &out)); err != nil {
		return nil, err
	}
	k := &PublicKey{ptr: out}
	runtime.SetFinalizer(k, func(k *PublicKey) { C.lux_fhe_publickey_free(k.ptr) })
	return k, nil
}

func wrapCt(p *C.LuxFheCiphertext) *Ciphertext {
	ct := &Ciphertext{ptr: p}
	runtime.SetFinalizer(ct, func(ct *Ciphertext) { C.lux_fhe_ciphertext_free(ct.ptr) })
	return ct
}

// Encrypt encrypts one bit under the secret key.
func (c *Context) Encrypt(sk *SecretKey, bit int) (*Ciphertext, error) {
	var out *C.LuxFheCiphertext
	if err := ckErr(C.lux_fhe_encrypt(c.ptr, sk.ptr, C.int(bit), &out)); err != nil {
		return nil, err
	}
	return wrapCt(out), nil
}

// EncryptPK encrypts one bit under the public key.
func (c *Context) EncryptPK(pk *PublicKey, rngSrc *SecretKey, bit int) (*Ciphertext, error) {
	var out *C.LuxFheCiphertext
	if err := ckErr(C.lux_fhe_encrypt_pk(c.ptr, pk.ptr, rngSrc.ptr, C.int(bit), &out)); err != nil {
		return nil, err
	}
	return wrapCt(out), nil
}

// Decrypt recovers the plaintext bit.
func (c *Context) Decrypt(sk *SecretKey, ct *Ciphertext) (int, error) {
	var out C.int
	if err := ckErr(C.lux_fhe_decrypt(c.ptr, sk.ptr, ct.ptr, &out)); err != nil {
		return 0, err
	}
	return int(out), nil
}

type gateFn func(*C.LuxFheContext, *C.LuxFheBootstrapKey, *C.LuxFheCiphertext,
	*C.LuxFheCiphertext, **C.LuxFheCiphertext) C.int

func (c *Context) gate(fn gateFn, bsk *BootstrapKey, a, b *Ciphertext) (*Ciphertext, error) {
	var out *C.LuxFheCiphertext
	if err := ckErr(fn(c.ptr, bsk.ptr, a.ptr, b.ptr, &out)); err != nil {
		return nil, err
	}
	return wrapCt(out), nil
}

// Bootstrapped binary gates.
func (c *Context) AND(bsk *BootstrapKey, a, b *Ciphertext) (*Ciphertext, error) {
	return c.gate(func(x *C.LuxFheContext, k *C.LuxFheBootstrapKey, p, q *C.LuxFheCiphertext, o **C.LuxFheCiphertext) C.int {
		return C.lux_fhe_and(x, k, p, q, o)
	}, bsk, a, b)
}
func (c *Context) OR(bsk *BootstrapKey, a, b *Ciphertext) (*Ciphertext, error) {
	return c.gate(func(x *C.LuxFheContext, k *C.LuxFheBootstrapKey, p, q *C.LuxFheCiphertext, o **C.LuxFheCiphertext) C.int {
		return C.lux_fhe_or(x, k, p, q, o)
	}, bsk, a, b)
}
func (c *Context) XOR(bsk *BootstrapKey, a, b *Ciphertext) (*Ciphertext, error) {
	return c.gate(func(x *C.LuxFheContext, k *C.LuxFheBootstrapKey, p, q *C.LuxFheCiphertext, o **C.LuxFheCiphertext) C.int {
		return C.lux_fhe_xor(x, k, p, q, o)
	}, bsk, a, b)
}
func (c *Context) NAND(bsk *BootstrapKey, a, b *Ciphertext) (*Ciphertext, error) {
	return c.gate(func(x *C.LuxFheContext, k *C.LuxFheBootstrapKey, p, q *C.LuxFheCiphertext, o **C.LuxFheCiphertext) C.int {
		return C.lux_fhe_nand(x, k, p, q, o)
	}, bsk, a, b)
}
func (c *Context) NOR(bsk *BootstrapKey, a, b *Ciphertext) (*Ciphertext, error) {
	return c.gate(func(x *C.LuxFheContext, k *C.LuxFheBootstrapKey, p, q *C.LuxFheCiphertext, o **C.LuxFheCiphertext) C.int {
		return C.lux_fhe_nor(x, k, p, q, o)
	}, bsk, a, b)
}
func (c *Context) XNOR(bsk *BootstrapKey, a, b *Ciphertext) (*Ciphertext, error) {
	return c.gate(func(x *C.LuxFheContext, k *C.LuxFheBootstrapKey, p, q *C.LuxFheCiphertext, o **C.LuxFheCiphertext) C.int {
		return C.lux_fhe_xnor(x, k, p, q, o)
	}, bsk, a, b)
}

// NOT is bootstrap-free.
func (c *Context) NOT(ct *Ciphertext) (*Ciphertext, error) {
	var out *C.LuxFheCiphertext
	if err := ckErr(C.lux_fhe_not(c.ptr, ct.ptr, &out)); err != nil {
		return nil, err
	}
	return wrapCt(out), nil
}

// MUX computes sel ? a : b.
func (c *Context) MUX(bsk *BootstrapKey, sel, a, b *Ciphertext) (*Ciphertext, error) {
	var out *C.LuxFheCiphertext
	if err := ckErr(C.lux_fhe_mux(c.ptr, bsk.ptr, sel.ptr, a.ptr, b.ptr, &out)); err != nil {
		return nil, err
	}
	return wrapCt(out), nil
}

// Bootstrap refreshes ciphertext noise.
func (c *Context) Bootstrap(bsk *BootstrapKey, ct *Ciphertext) (*Ciphertext, error) {
	var out *C.LuxFheCiphertext
	if err := ckErr(C.lux_fhe_bootstrap(c.ptr, bsk.ptr, ct.ptr, &out)); err != nil {
		return nil, err
	}
	return wrapCt(out), nil
}

// Marshal serializes a ciphertext to bytes.
func (ct *Ciphertext) Marshal() ([]byte, error) {
	var data *C.uint8_t
	var n C.int64_t
	if err := ckErr(C.lux_fhe_ciphertext_marshal(ct.ptr, &data, &n)); err != nil {
		return nil, err
	}
	out := C.GoBytes(unsafe.Pointer(data), C.int(n))
	C.lux_fhe_bytes_free(data)
	return out, nil
}

// UnmarshalCiphertext restores a ciphertext from bytes.
func UnmarshalCiphertext(data []byte) (*Ciphertext, error) {
	var out *C.LuxFheCiphertext
	if err := ckErr(C.lux_fhe_ciphertext_unmarshal(
		(*C.uint8_t)(unsafe.Pointer(&data[0])), C.int64_t(len(data)), &out)); err != nil {
		return nil, err
	}
	return wrapCt(out), nil
}
