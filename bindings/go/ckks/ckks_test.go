package ckks

import (
	"math"
	"testing"
)

func newStack(t *testing.T) (*Context, *KeyPair) {
	t.Helper()
	p := Parameters{LogN: 8, LogQ: 104, Scale: float64(uint64(1) << 26)}
	ctx, err := NewContext(p)
	if err != nil {
		t.Fatalf("NewContext: %v", err)
	}
	kp, err := ctx.KeyGen()
	if err != nil {
		t.Fatalf("KeyGen: %v", err)
	}
	return ctx, kp
}

func approxEq(t *testing.T, got, want []float64, tol float64, what string) {
	t.Helper()
	for i := range want {
		if math.Abs(got[i]-want[i]) > tol {
			t.Fatalf("%s[%d] = %g, want %g (tol %g)", what, i, got[i], want[i], tol)
		}
	}
}

func TestEncryptDecryptRoundtrip(t *testing.T) {
	ctx, kp := newStack(t)
	defer ctx.Free()
	vals := []float64{0.5, -1.25, 2.0, 3.0}
	ct, err := ctx.Encrypt(kp, vals)
	if err != nil {
		t.Fatalf("Encrypt: %v", err)
	}
	got, err := ctx.Decrypt(kp, ct)
	if err != nil {
		t.Fatalf("Decrypt: %v", err)
	}
	approxEq(t, got, vals, 1e-3, "roundtrip")
}

func TestAddMult(t *testing.T) {
	ctx, kp := newStack(t)
	defer ctx.Free()
	a := []float64{1.0, 2.0, -0.5}
	b := []float64{0.25, -1.0, 4.0}
	ca, _ := ctx.Encrypt(kp, a)
	cb, _ := ctx.Encrypt(kp, b)
	sum, err := ctx.Add(ca, cb)
	if err != nil {
		t.Fatalf("Add: %v", err)
	}
	got, _ := ctx.Decrypt(kp, sum)
	approxEq(t, got, []float64{1.25, 1.0, 3.5}, 1e-3, "add")
	prod, err := ctx.Mult(kp, ca, cb)
	if err != nil {
		t.Fatalf("Mult: %v", err)
	}
	got, _ = ctx.Decrypt(kp, prod)
	approxEq(t, got, []float64{0.25, -2.0, -2.0}, 1e-2, "mult")
}

func TestSerializeRoundtrip(t *testing.T) {
	ctx, kp := newStack(t)
	defer ctx.Free()
	ct, _ := ctx.Encrypt(kp, []float64{1.5, -2.5})
	raw, err := ct.Serialize()
	if err != nil {
		t.Fatalf("Serialize: %v", err)
	}
	back, err := ctx.Deserialize(raw)
	if err != nil {
		t.Fatalf("Deserialize: %v", err)
	}
	got, _ := ctx.Decrypt(kp, back)
	approxEq(t, got, []float64{1.5, -2.5}, 1e-3, "serde")
}
