package ckks

// CKKS benchmarks over the C ABI (reference pattern:
// go/backend_bench_test.go BenchmarkCKKS_*).

import "testing"

func benchCtx(b *testing.B) (*Context, *KeyPair) {
	b.Helper()
	ctx, err := NewContext(DefaultParameters())
	if err != nil {
		b.Fatalf("NewContext: %v", err)
	}
	kp, err := ctx.KeyGen()
	if err != nil {
		b.Fatalf("KeyGen: %v", err)
	}
	return ctx, kp
}

func benchValues(n int) []float64 {
	v := make([]float64, n)
	for i := range v {
		v[i] = float64(i%7) * 0.25
	}
	return v
}

func BenchmarkEncrypt(b *testing.B) {
	ctx, kp := benchCtx(b)
	vals := benchValues(64)
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		ct, err := ctx.Encrypt(kp, vals)
		if err != nil {
			b.Fatal(err)
		}
		ct.Free()
	}
}

func BenchmarkDecrypt(b *testing.B) {
	ctx, kp := benchCtx(b)
	ct, err := ctx.Encrypt(kp, benchValues(64))
	if err != nil {
		b.Fatal(err)
	}
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		if _, err := ctx.Decrypt(kp, ct); err != nil {
			b.Fatal(err)
		}
	}
}

func BenchmarkAdd(b *testing.B) {
	ctx, kp := benchCtx(b)
	c1, _ := ctx.Encrypt(kp, benchValues(64))
	c2, _ := ctx.Encrypt(kp, benchValues(64))
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		out, err := ctx.Add(c1, c2)
		if err != nil {
			b.Fatal(err)
		}
		out.Free()
	}
}

func BenchmarkMult(b *testing.B) {
	ctx, kp := benchCtx(b)
	c1, _ := ctx.Encrypt(kp, benchValues(64))
	c2, _ := ctx.Encrypt(kp, benchValues(64))
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		out, err := ctx.Mult(kp, c1, c2)
		if err != nil {
			b.Fatal(err)
		}
		out.Free()
	}
}

func BenchmarkRotate(b *testing.B) {
	ctx, kp := benchCtx(b)
	ct, _ := ctx.Encrypt(kp, benchValues(64))
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		out, err := ctx.Rotate(kp, ct, 1)
		if err != nil {
			b.Fatal(err)
		}
		out.Free()
	}
}

func BenchmarkSerialize(b *testing.B) {
	ctx, kp := benchCtx(b)
	ct, _ := ctx.Encrypt(kp, benchValues(64))
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		if _, err := ct.Serialize(); err != nil {
			b.Fatal(err)
		}
	}
}
