// Package fhe: Go bindings for the fhe_tpu native client library.
//
// The role of the reference's go/tfhe package (reference:
// go/tfhe/context.go:7-42 cgo bridge) retargeted at this framework's
// split: clients link the dependency-free native library
// (fhe_tpu/native/client.cpp) for keygen/encrypt/decrypt; homomorphic
// evaluation happens on the TPU engine behind the HTTP service
// (fhe_tpu/server.py) or a job queue.
//
// Build: compile libfheclient.so from fhe_tpu/native/client.cpp, then
//   CGO_LDFLAGS="-L<path> -lfheclient" go build ./...
// (no Go toolchain ships in this repo's CI image; covered by the
// cross-language ABI tests in tests/test_native_client.py instead).
package fhe

/*
#cgo LDFLAGS: -lfheclient
#include <stdint.h>
int  fhe_client_version();
void fhe_blake2b(const uint8_t* in, int64_t inlen, uint8_t* out, int outlen);
void fhe_lwe_keygen(const uint8_t* seed32, int n, int32_t* sk_out);
void fhe_lwe_encrypt(const int32_t* sk, int n, uint64_t q, int p,
                     const int32_t* m, int64_t batch, const uint8_t* seed32,
                     double std_dev, uint32_t* a_out, uint32_t* b_out);
void fhe_lwe_decrypt(const int32_t* sk, int n, uint64_t q, int p,
                     const uint32_t* a, const uint32_t* b, int64_t batch,
                     int32_t* m_out);
*/
import "C"
import "unsafe"

// Version reports the native library ABI version.
func Version() int { return int(C.fhe_client_version()) }

// KeyGen derives a ternary LWE secret of dimension n from a 32-byte seed.
func KeyGen(seed [32]byte, n int) []int32 {
	sk := make([]int32, n)
	C.fhe_lwe_keygen((*C.uint8_t)(unsafe.Pointer(&seed[0])), C.int(n),
		(*C.int32_t)(unsafe.Pointer(&sk[0])))
	return sk
}

// Encrypt produces batch LWE ciphertexts (a [batch][n], b [batch]) with
// b = <a,s> + e + m*(q/p) mod q -- byte-compatible with fhe_tpu.tfhe.lwe.
func Encrypt(sk []int32, q uint64, p int, msgs []int32,
	seed [32]byte, stdDev float64) ([]uint32, []uint32) {
	n, batch := len(sk), len(msgs)
	a := make([]uint32, batch*n)
	b := make([]uint32, batch)
	C.fhe_lwe_encrypt((*C.int32_t)(unsafe.Pointer(&sk[0])), C.int(n),
		C.uint64_t(q), C.int(p),
		(*C.int32_t)(unsafe.Pointer(&msgs[0])), C.int64_t(batch),
		(*C.uint8_t)(unsafe.Pointer(&seed[0])), C.double(stdDev),
		(*C.uint32_t)(unsafe.Pointer(&a[0])),
		(*C.uint32_t)(unsafe.Pointer(&b[0])))
	return a, b
}

// Decrypt recovers the batch of messages.
func Decrypt(sk []int32, q uint64, p int, a, b []uint32) []int32 {
	n, batch := len(sk), len(b)
	m := make([]int32, batch)
	C.fhe_lwe_decrypt((*C.int32_t)(unsafe.Pointer(&sk[0])), C.int(n),
		C.uint64_t(q), C.int(p),
		(*C.uint32_t)(unsafe.Pointer(&a[0])),
		(*C.uint32_t)(unsafe.Pointer(&b[0])), C.int64_t(batch),
		(*C.int32_t)(unsafe.Pointer(&m[0])))
	return m
}
