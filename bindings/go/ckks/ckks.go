// Package ckks: Go bindings for the fhe_tpu CKKS C ABI.
//
// The reference's go/ckks package (go/ckks/context.go + bridge.cpp) binds
// an OpenFHE CryptoContext<DCRTPoly> through cgo.  Here the same Go
// surface rides libfhecapi.so (fhe_tpu/native/capi.cpp ckks_* section),
// which embeds CPython and drives the JAX/TPU compute path in-process.
//
// Differences from the reference, on purpose:
//   - Mult takes the KeyPair (eval keys live on the keypair here; the
//     reference registers them globally on the context).
//   - Rotate works for ANY step (missing rotation keys are generated
//     lazily); the reference only pre-generates +-{1,2,4,8,16}.
//   - Bootstrap actually works (lazy EvalBootstrapSetup/KeyGen on first
//     use); the reference bridge calls EvalBootstrap without ever doing
//     Setup and always errors (bridge.cpp:182-195).
//
// Build: python -c "from fhe_tpu.native import capi; capi.get_lib()"
// (auto-compiles libfhecapi.so), then
//
//	CGO_LDFLAGS="-L<repo>/fhe_tpu/native -lfhecapi -lpython3.12" \
//	FHE_TPU_PATH=<repo> go build ./...
//
// (no Go toolchain ships in this repo's CI image; the identical C ABI is
// covered by tests/test_capi.py::TestCkksAbi.)
package ckks

/*
#cgo LDFLAGS: -lfhecapi
#include <stdlib.h>

typedef struct CKKSContext CKKSContext;
typedef struct CKKSKeyPair CKKSKeyPair;
typedef struct CKKSCiphertext CKKSCiphertext;

CKKSContext* ckks_context_new(int log_n, int log_q, double scale);
void ckks_context_free(CKKSContext* ctx);
CKKSKeyPair* ckks_keygen(CKKSContext* ctx);
void ckks_keypair_free(CKKSKeyPair* kp);
CKKSCiphertext* ckks_encrypt(CKKSContext* ctx, CKKSKeyPair* kp, double* values, int len);
double* ckks_decrypt(CKKSContext* ctx, CKKSKeyPair* kp, CKKSCiphertext* ct, int* out_len);
void ckks_ciphertext_free(CKKSCiphertext* ct);
CKKSCiphertext* ckks_add(CKKSContext* ctx, CKKSCiphertext* a, CKKSCiphertext* b);
CKKSCiphertext* ckks_sub(CKKSContext* ctx, CKKSCiphertext* a, CKKSCiphertext* b);
CKKSCiphertext* ckks_mult(CKKSContext* ctx, CKKSCiphertext* a, CKKSCiphertext* b);
CKKSCiphertext* ckks_mult_kp(CKKSContext* ctx, CKKSKeyPair* kp, CKKSCiphertext* a, CKKSCiphertext* b);
int ckks_context_levels(CKKSContext* ctx);
CKKSCiphertext* ckks_rotate(CKKSContext* ctx, CKKSKeyPair* kp, CKKSCiphertext* ct, int steps);
CKKSCiphertext* ckks_bootstrap(CKKSContext* ctx, CKKSKeyPair* kp, CKKSCiphertext* ct);
unsigned char* ckks_serialize_ciphertext(CKKSCiphertext* ct, int* out_len);
CKKSCiphertext* ckks_deserialize_ciphertext(CKKSContext* ctx, unsigned char* data, int len);
*/
import "C"

import (
	"errors"
	"runtime"
	"unsafe"
)

// Parameters configures a CKKS context (reference go/ckks/context.go:87).
type Parameters struct {
	LogN  int     // ring dimension = 1 << LogN
	LogQ  int     // total modulus-chain bit budget
	Scale float64 // encoding scale factor (delta)
}

// DefaultParameters mirrors the reference defaults: N=2^14 ring,
// ~2^438 chain, delta = 2^40 (realized as composite scaling on the
// uint32-limb chain).
func DefaultParameters() Parameters {
	return Parameters{LogN: 14, LogQ: 438, Scale: float64(uint64(1) << 40)}
}

// Context wraps a CKKS crypto context.
type Context struct {
	ptr    *C.CKKSContext
	params Parameters
}

// NewContext creates a CKKS context from parameters.
func NewContext(params Parameters) (*Context, error) {
	ptr := C.ckks_context_new(C.int(params.LogN), C.int(params.LogQ),
		C.double(params.Scale))
	if ptr == nil {
		return nil, errors.New("ckks: context creation failed")
	}
	c := &Context{ptr: ptr, params: params}
	runtime.SetFinalizer(c, (*Context).Free)
	return c, nil
}

// Free releases the context.
func (c *Context) Free() {
	if c.ptr != nil {
		C.ckks_context_free(c.ptr)
		c.ptr = nil
	}
}

// Parameters returns the parameters this context was built with.
func (c *Context) Parameters() Parameters { return c.params }

// KeyPair holds secret/public/eval keys.
type KeyPair struct {
	ptr *C.CKKSKeyPair
}

// KeyGen generates a keypair with relinearization and stock rotation keys.
func (c *Context) KeyGen() (*KeyPair, error) {
	if c.ptr == nil {
		return nil, errors.New("ckks: context freed")
	}
	ptr := C.ckks_keygen(c.ptr)
	if ptr == nil {
		return nil, errors.New("ckks: key generation failed")
	}
	kp := &KeyPair{ptr: ptr}
	runtime.SetFinalizer(kp, (*KeyPair).Free)
	return kp, nil
}

// Free releases the keypair.
func (kp *KeyPair) Free() {
	if kp.ptr != nil {
		C.ckks_keypair_free(kp.ptr)
		kp.ptr = nil
	}
}

// Ciphertext is an encrypted vector of float64 slots.
type Ciphertext struct {
	ptr *C.CKKSCiphertext
}

// Free releases the ciphertext.
func (ct *Ciphertext) Free() {
	if ct.ptr != nil {
		C.ckks_ciphertext_free(ct.ptr)
		ct.ptr = nil
	}
}

func wrapCt(ptr *C.CKKSCiphertext, op string) (*Ciphertext, error) {
	if ptr == nil {
		return nil, errors.New("ckks: " + op + " failed")
	}
	ct := &Ciphertext{ptr: ptr}
	runtime.SetFinalizer(ct, (*Ciphertext).Free)
	return ct, nil
}

// Encrypt packs values into slots and encrypts under the public key.
func (c *Context) Encrypt(kp *KeyPair, values []float64) (*Ciphertext, error) {
	if c.ptr == nil || kp == nil || kp.ptr == nil || len(values) == 0 {
		return nil, errors.New("ckks: invalid encrypt arguments")
	}
	ptr := C.ckks_encrypt(c.ptr, kp.ptr,
		(*C.double)(unsafe.Pointer(&values[0])), C.int(len(values)))
	return wrapCt(ptr, "encrypt")
}

// Decrypt decrypts and decodes all slots.
func (c *Context) Decrypt(kp *KeyPair, ct *Ciphertext) ([]float64, error) {
	if c.ptr == nil || kp == nil || kp.ptr == nil || ct == nil || ct.ptr == nil {
		return nil, errors.New("ckks: invalid decrypt arguments")
	}
	var outLen C.int
	data := C.ckks_decrypt(c.ptr, kp.ptr, ct.ptr, &outLen)
	if data == nil {
		return nil, errors.New("ckks: decryption failed")
	}
	defer C.free(unsafe.Pointer(data))
	length := int(outLen)
	cSlice := (*[1 << 30]C.double)(unsafe.Pointer(data))[:length:length]
	out := make([]float64, length)
	for i, v := range cSlice {
		out[i] = float64(v)
	}
	return out, nil
}

// Add returns a + b (slotwise), with automatic level/scale alignment.
func (c *Context) Add(a, b *Ciphertext) (*Ciphertext, error) {
	if c.ptr == nil || a == nil || a.ptr == nil || b == nil || b.ptr == nil {
		return nil, errors.New("ckks: invalid add arguments")
	}
	return wrapCt(C.ckks_add(c.ptr, a.ptr, b.ptr), "add")
}

// Sub returns a - b (slotwise).
func (c *Context) Sub(a, b *Ciphertext) (*Ciphertext, error) {
	if c.ptr == nil || a == nil || a.ptr == nil || b == nil || b.ptr == nil {
		return nil, errors.New("ckks: invalid sub arguments")
	}
	return wrapCt(C.ckks_sub(c.ptr, a.ptr, b.ptr), "sub")
}

// Mult returns a * b (slotwise) with relinearization + rescale.
func (c *Context) Mult(kp *KeyPair, a, b *Ciphertext) (*Ciphertext, error) {
	if c.ptr == nil || kp == nil || kp.ptr == nil ||
		a == nil || a.ptr == nil || b == nil || b.ptr == nil {
		return nil, errors.New("ckks: invalid mult arguments")
	}
	return wrapCt(C.ckks_mult_kp(c.ptr, kp.ptr, a.ptr, b.ptr), "mult")
}

// Rotate rotates slots left by steps (negative = right).
func (c *Context) Rotate(kp *KeyPair, ct *Ciphertext, steps int) (*Ciphertext, error) {
	if c.ptr == nil || kp == nil || kp.ptr == nil || ct == nil || ct.ptr == nil {
		return nil, errors.New("ckks: invalid rotate arguments")
	}
	return wrapCt(C.ckks_rotate(c.ptr, kp.ptr, ct.ptr, C.int(steps)), "rotate")
}

// Bootstrap refreshes the ciphertext's level budget (lazy setup on the
// keypair's first call; needs a chain of >= 10 limbs).
func (c *Context) Bootstrap(kp *KeyPair, ct *Ciphertext) (*Ciphertext, error) {
	if c.ptr == nil || kp == nil || kp.ptr == nil || ct == nil || ct.ptr == nil {
		return nil, errors.New("ckks: invalid bootstrap arguments")
	}
	return wrapCt(C.ckks_bootstrap(c.ptr, kp.ptr, ct.ptr), "bootstrap")
}

// Serialize encodes the ciphertext to portable bytes.
func (ct *Ciphertext) Serialize() ([]byte, error) {
	if ct == nil || ct.ptr == nil {
		return nil, errors.New("ckks: nil ciphertext")
	}
	var outLen C.int
	data := C.ckks_serialize_ciphertext(ct.ptr, &outLen)
	if data == nil {
		return nil, errors.New("ckks: serialization failed")
	}
	defer C.free(unsafe.Pointer(data))
	return C.GoBytes(unsafe.Pointer(data), outLen), nil
}

// Deserialize decodes ciphertext bytes produced by Serialize.
func (c *Context) Deserialize(data []byte) (*Ciphertext, error) {
	if c.ptr == nil || len(data) == 0 {
		return nil, errors.New("ckks: invalid deserialize arguments")
	}
	ptr := C.ckks_deserialize_ciphertext(c.ptr,
		(*C.uchar)(unsafe.Pointer(&data[0])), C.int(len(data)))
	return wrapCt(ptr, "deserialize")
}
