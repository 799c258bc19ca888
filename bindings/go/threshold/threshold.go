// Package threshold provides threshold FHE operations for distributed
// decryption: any t-of-n parties can jointly decrypt, fewer learn nothing.
//
// The reference's go/threshold package is an unimplemented stub
// (go/threshold/threshold.go:8 "TODO: Implement threshold FHE bindings").
// This one drives the real pipeline in fhe_tpu/tfhe/threshold.py through
// libfhecapi.so's lux_fhe_threshold_* ABI: Shamir (t-of-n, with Feldman
// commitments and sigma-protocol correctness proofs) or additive (n-of-n)
// key shares, batch partial decryptions, Lagrange combine.
//
// Build: python -c "from fhe_tpu.native import capi; capi.get_lib()"
// (auto-compiles libfhecapi.so), then
//
//	CGO_LDFLAGS="-L<repo>/fhe_tpu/native -lfhecapi -lpython3.12" \
//	FHE_TPU_PATH=<repo> go build ./...
//
// (no Go toolchain ships in this repo's CI image; the identical C ABI is
// covered by tests/test_capi.py::test_threshold_abi.)
package threshold

/*
#cgo LDFLAGS: -lfhecapi
#include <stdint.h>
#include <stdlib.h>

typedef struct LuxFheContext LuxFheContext;
typedef struct LuxFheSecretKey LuxFheSecretKey;
typedef struct LuxFheCiphertext LuxFheCiphertext;
typedef struct LuxFheThresholdShares LuxFheThresholdShares;

int lux_fhe_threshold_keygen(LuxFheContext* ctx, LuxFheSecretKey* sk, int threshold, int parties, const char* scheme, LuxFheThresholdShares** out);
void lux_fhe_threshold_free(LuxFheThresholdShares* sh);
int lux_fhe_threshold_parties(LuxFheThresholdShares* sh);
int lux_fhe_threshold_decrypt(LuxFheContext* ctx, LuxFheThresholdShares* sh, LuxFheCiphertext* ct, const int32_t* party_ids, int count, int* plaintext);
*/
import "C"

import (
	"errors"
	"runtime"
	"unsafe"
)

// Scheme selects the sharing scheme.
type Scheme string

const (
	// Additive is n-of-n additive sharing (all parties required).
	Additive Scheme = "additive"
	// Shamir is t-of-n polynomial sharing with Feldman commitments.
	//
	// LIMITATION: Shamir reconstruction needs pairwise-invertible
	// party-id differences, i.e. a prime share modulus.  Every context
	// reachable through this ABI uses a power-of-two LWE modulus q
	// (q = 2N / 8192 / 512), so KeyGen(scheme=Shamir) always fails with
	// ErrKeygen here.  Shamir IS available in-process on Q-extended
	// ciphertexts (prime gate modulus Q — fhe_tpu/tfhe/threshold.py,
	// tests/test_threshold.py::test_shamir_2_of_3_extended); the ABI
	// does not yet expose extended-ciphertext gates.  Use Additive.
	Shamir Scheme = "shamir"
)

// Config holds threshold configuration (batch_threshold.h:47-62).
type Config struct {
	Threshold int    // Minimum parties needed (t)
	Total     int    // Total parties (n)
	Scheme    Scheme // Additive or Shamir
}

// Shares is an opaque handle to a generated t-of-n share set (with the
// verification keys the combiner uses to check correctness proofs).
type Shares struct {
	ptr    *C.LuxFheThresholdShares
	config Config
}

// KeyGen splits a context's secret key into cfg.Total shares.  ctx and sk
// are the opaque handles from the tfhe package (Context.Ptr / SecretKey.Ptr).
func KeyGen(ctx, sk unsafe.Pointer, cfg Config) (*Shares, error) {
	if ctx == nil || sk == nil {
		return nil, errors.New("threshold: nil context or key")
	}
	scheme := cfg.Scheme
	if scheme == "" {
		scheme = Additive
	}
	cs := C.CString(string(scheme))
	defer func() { C.free(unsafe.Pointer(cs)) }()
	var out *C.LuxFheThresholdShares
	rc := C.lux_fhe_threshold_keygen(
		(*C.LuxFheContext)(ctx), (*C.LuxFheSecretKey)(sk),
		C.int(cfg.Threshold), C.int(cfg.Total), cs, &out)
	if rc != 0 {
		return nil, errors.New("threshold: key share generation failed")
	}
	s := &Shares{ptr: out, config: cfg}
	runtime.SetFinalizer(s, (*Shares).Free)
	return s, nil
}

// Free releases the share set.
func (s *Shares) Free() {
	if s.ptr != nil {
		C.lux_fhe_threshold_free(s.ptr)
		s.ptr = nil
	}
}

// Parties returns the total number of shares.
func (s *Shares) Parties() int {
	if s.ptr == nil {
		return 0
	}
	return int(C.lux_fhe_threshold_parties(s.ptr))
}

// Decrypt runs partial decryptions for the listed parties (1-indexed),
// verifies their correctness proofs, and Lagrange-combines.  Errors when
// the quorum is below cfg.Threshold or a proof fails.
func (s *Shares) Decrypt(ctx unsafe.Pointer, ct unsafe.Pointer,
	partyIDs []int) (int, error) {
	if s.ptr == nil || ctx == nil || ct == nil || len(partyIDs) == 0 {
		return 0, errors.New("threshold: invalid decrypt arguments")
	}
	ids := make([]int32, len(partyIDs))
	for i, p := range partyIDs {
		ids[i] = int32(p)
	}
	var out C.int
	rc := C.lux_fhe_threshold_decrypt(
		(*C.LuxFheContext)(ctx), s.ptr, (*C.LuxFheCiphertext)(ct),
		(*C.int32_t)(unsafe.Pointer(&ids[0])), C.int(len(ids)), &out)
	if rc != 0 {
		return 0, errors.New("threshold: decryption failed (quorum/proof)")
	}
	return int(out), nil
}
