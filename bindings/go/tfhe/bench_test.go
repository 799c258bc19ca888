package tfhe

// Benchmarks over the C ABI (reference pattern: go/tfhe/bench_test.go
// BenchmarkOpenFHE*).  Run with:
//   CGO_LDFLAGS="-L<repo>/fhe_tpu/native -lfhecapi" \
//   LD_LIBRARY_PATH=<repo>/fhe_tpu/native go test -bench . ./tfhe

import "testing"

func benchStack(b *testing.B) (*Context, *SecretKey, *BootstrapKey) {
	b.Helper()
	ctx, err := NewContext("TOY", "GINX")
	if err != nil {
		b.Fatalf("NewContext: %v", err)
	}
	sk, err := ctx.KeyGen(42)
	if err != nil {
		b.Fatalf("KeyGen: %v", err)
	}
	bsk, err := ctx.BTKeyGen(sk)
	if err != nil {
		b.Fatalf("BTKeyGen: %v", err)
	}
	return ctx, sk, bsk
}

func BenchmarkKeyGen(b *testing.B) {
	ctx, err := NewContext("TOY", "GINX")
	if err != nil {
		b.Fatalf("NewContext: %v", err)
	}
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		if _, err := ctx.KeyGen(uint64(i)); err != nil {
			b.Fatal(err)
		}
	}
}

func BenchmarkBootstrapKeyGen(b *testing.B) {
	ctx, err := NewContext("TOY", "GINX")
	if err != nil {
		b.Fatalf("NewContext: %v", err)
	}
	sk, err := ctx.KeyGen(42)
	if err != nil {
		b.Fatalf("KeyGen: %v", err)
	}
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		if _, err := ctx.BTKeyGen(sk); err != nil {
			b.Fatal(err)
		}
	}
}

func BenchmarkEncrypt(b *testing.B) {
	ctx, sk, _ := benchStack(b)
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		if _, err := ctx.Encrypt(sk, i&1); err != nil {
			b.Fatal(err)
		}
	}
}

func BenchmarkDecrypt(b *testing.B) {
	ctx, sk, _ := benchStack(b)
	ct, err := ctx.Encrypt(sk, 1)
	if err != nil {
		b.Fatal(err)
	}
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		if _, err := ctx.Decrypt(sk, ct); err != nil {
			b.Fatal(err)
		}
	}
}

func BenchmarkAND(b *testing.B) {
	ctx, sk, bsk := benchStack(b)
	ca, _ := ctx.Encrypt(sk, 1)
	cb, _ := ctx.Encrypt(sk, 0)
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		if _, err := ctx.AND(bsk, ca, cb); err != nil {
			b.Fatal(err)
		}
	}
}

func BenchmarkNAND(b *testing.B) {
	ctx, sk, bsk := benchStack(b)
	ca, _ := ctx.Encrypt(sk, 1)
	cb, _ := ctx.Encrypt(sk, 0)
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		if _, err := ctx.NAND(bsk, ca, cb); err != nil {
			b.Fatal(err)
		}
	}
}

func BenchmarkXOR(b *testing.B) {
	ctx, sk, bsk := benchStack(b)
	ca, _ := ctx.Encrypt(sk, 1)
	cb, _ := ctx.Encrypt(sk, 0)
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		if _, err := ctx.XOR(bsk, ca, cb); err != nil {
			b.Fatal(err)
		}
	}
}

func BenchmarkBootstrap(b *testing.B) {
	ctx, sk, bsk := benchStack(b)
	ct, _ := ctx.Encrypt(sk, 1)
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		if _, err := ctx.Bootstrap(bsk, ct); err != nil {
			b.Fatal(err)
		}
	}
}
