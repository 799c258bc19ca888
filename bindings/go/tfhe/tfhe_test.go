package tfhe

// End-to-end tests against libfhecapi.so (reference pattern:
// go/tfhe/context.go + .github/workflows/build.yml go-test job).
//
// Run with:
//   python -c "from fhe_tpu.native import capi; assert capi.get_lib()"
//   CGO_LDFLAGS="-L<repo>/fhe_tpu/native -lfhecapi" \
//   LD_LIBRARY_PATH=<repo>/fhe_tpu/native go test ./...

import "testing"

func newStack(t *testing.T) (*Context, *SecretKey, *BootstrapKey) {
	t.Helper()
	ctx, err := NewContext("TOY", "GINX")
	if err != nil {
		t.Fatalf("NewContext: %v", err)
	}
	sk, err := ctx.KeyGen(42)
	if err != nil {
		t.Fatalf("KeyGen: %v", err)
	}
	bsk, err := ctx.BTKeyGen(sk)
	if err != nil {
		t.Fatalf("BTKeyGen: %v", err)
	}
	return ctx, sk, bsk
}

func TestVersion(t *testing.T) {
	if v := Version(); v != "1.4.2" {
		t.Fatalf("version = %q, want 1.4.2", v)
	}
}

func TestANDTruthTable(t *testing.T) {
	ctx, sk, bsk := newStack(t)
	for a := 0; a <= 1; a++ {
		for b := 0; b <= 1; b++ {
			ca, err := ctx.Encrypt(sk, a)
			if err != nil {
				t.Fatalf("Encrypt(%d): %v", a, err)
			}
			cb, err := ctx.Encrypt(sk, b)
			if err != nil {
				t.Fatalf("Encrypt(%d): %v", b, err)
			}
			out, err := ctx.AND(bsk, ca, cb)
			if err != nil {
				t.Fatalf("AND(%d,%d): %v", a, b, err)
			}
			got, err := ctx.Decrypt(sk, out)
			if err != nil {
				t.Fatalf("Decrypt: %v", err)
			}
			if got != a&b {
				t.Fatalf("AND(%d,%d) = %d, want %d", a, b, got, a&b)
			}
		}
	}
}

func TestNotAndMux(t *testing.T) {
	ctx, sk, bsk := newStack(t)
	c0, _ := ctx.Encrypt(sk, 0)
	c1, _ := ctx.Encrypt(sk, 1)
	n, err := ctx.NOT(c1)
	if err != nil {
		t.Fatalf("NOT: %v", err)
	}
	if got, _ := ctx.Decrypt(sk, n); got != 0 {
		t.Fatalf("NOT(1) = %d, want 0", got)
	}
	m, err := ctx.MUX(bsk, c1, c0, c1) // sel=1 -> first arg
	if err != nil {
		t.Fatalf("MUX: %v", err)
	}
	if got, _ := ctx.Decrypt(sk, m); got != 0 {
		t.Fatalf("MUX(1, 0, 1) = %d, want 0", got)
	}
}

func BenchmarkANDGate(b *testing.B) {
	ctx, err := NewContext("STD128", "GINX")
	if err != nil {
		b.Fatalf("NewContext: %v", err)
	}
	sk, _ := ctx.KeyGen(7)
	bsk, _ := ctx.BTKeyGen(sk)
	ca, _ := ctx.Encrypt(sk, 1)
	cb, _ := ctx.Encrypt(sk, 1)
	b.ResetTimer()
	for i := 0; i < b.N; i++ {
		out, err := ctx.AND(bsk, ca, cb)
		if err != nil {
			b.Fatalf("AND: %v", err)
		}
		_ = out
	}
}
