// Cross-implementation known-answer-vector dumper.
//
// Links against the REFERENCE build (/root/reference compiled CPU-only,
// MATHBACKEND=4) and dumps deterministic vectors that the TPU framework's
// tests (tests/test_reference_kat.py) replay for bit-exact parity:
//
//   * negacyclic NTT: forward-transform outputs (reference bit-reversed
//     ordering + its root of unity) and full negacyclic polynomial
//     products (root-convention-free) -- transformnat-impl.h:302 semantics;
//   * LWE encrypt/decrypt interop: reference-encrypted ciphertexts +
//     raw secret key, decrypted by the TPU implementation;
//   * TFHE gate KAT: the reference's TOY bootstrap key (BSK in COEFFICIENT
//     format so NTT conventions drop out) + switching key + fresh input
//     ciphertexts + the reference's own gate outputs -- the TPU pipeline
//     runs its blind rotation with the REFERENCE's keys and must decrypt
//     to the same gate results.
//
// Output: a directory of .npy files + manifest.json (see npy_save below).
//
// Build (out-of-tree reference build at /tmp/refbuild):
//   g++ -O2 -std=c++17 tools/ref_kat_dump.cpp -o /tmp/ref_kat_dump \
//     -I/root/reference/src/core/include -I/root/reference/src/binfhe/include \
//     -I/tmp/refbuild/src/core -I/root/reference/install/include/openfhe \
//     -L/tmp/refbuild/lib -lFHEbin -lFHEcore -fopenmp \
//     -Wl,-rpath,/tmp/refbuild/lib
//   /tmp/ref_kat_dump tests/vectors

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <random>
#include <sstream>
#include <string>
#include <vector>

#include "binfhecontext.h"
#include "math/math-hal.h"
#include "rgsw-acc-cggi.h"

using namespace lux::fhe;

// ---------------------------------------------------------------------------
// minimal .npy writer (uint64 little-endian, C order)
// ---------------------------------------------------------------------------
static void npy_save(const std::string& path, const std::vector<uint64_t>& data,
                     const std::vector<size_t>& shape) {
    // all dumped values fit in uint32 (Q < 2^28 everywhere) -- store '<u4'
    std::vector<uint32_t> d32(data.size());
    for (size_t i = 0; i < data.size(); ++i) d32[i] = (uint32_t)data[i];
    std::ostringstream hdr;
    hdr << "{'descr': '<u4', 'fortran_order': False, 'shape': (";
    for (size_t i = 0; i < shape.size(); ++i) {
        hdr << shape[i];
        if (shape.size() == 1 || i + 1 < shape.size()) hdr << (shape.size() == 1 ? "," : (i + 1 < shape.size() ? ", " : ""));
    }
    hdr << "), }";
    std::string h = hdr.str();
    size_t total = 10 + h.size() + 1;           // magic+ver+len + header + \n
    size_t pad = (64 - (total % 64)) % 64;
    h += std::string(pad, ' ');
    h += '\n';
    uint16_t hlen = static_cast<uint16_t>(h.size());
    std::ofstream f(path, std::ios::binary);
    f.write("\x93NUMPY\x01\x00", 8);
    f.write(reinterpret_cast<const char*>(&hlen), 2);
    f.write(h.data(), h.size());
    f.write(reinterpret_cast<const char*>(d32.data()),
            d32.size() * sizeof(uint32_t));
}

static std::vector<uint64_t> vec_of(const NativeVector& v) {
    std::vector<uint64_t> out(v.GetLength());
    for (size_t i = 0; i < v.GetLength(); ++i) out[i] = v[i].ConvertToInt();
    return out;
}

// ---------------------------------------------------------------------------

static std::string g_manifest;

static void manifest_add(const std::string& kv) {
    if (!g_manifest.empty()) g_manifest += ",\n";
    g_manifest += "  " + kv;
}

static void dump_ntt(const std::string& dir, uint32_t N, uint32_t logQ,
                     const std::string& tag, std::mt19937_64& gen) {
    using Params = ILNativeParams;
    NativeInteger Q = LastPrime<NativeInteger>(logQ, 2 * N);
    auto params = std::make_shared<Params>(2 * N, Q);
    uint64_t q = Q.ConvertToInt();
    uint64_t psi = params->GetRootOfUnity().ConvertToInt();

    std::uniform_int_distribution<uint64_t> dist(0, q - 1);
    const size_t B = 4;                      // a small batch of vectors
    std::vector<uint64_t> in(B * N), fwd(B * N), prod(B * N), in2(B * N);
    for (size_t b = 0; b < B; ++b) {
        NativePoly a(params, Format::COEFFICIENT);
        NativePoly c(params, Format::COEFFICIENT);
        NativeVector av(N, Q), cv(N, Q);
        for (size_t i = 0; i < N; ++i) {
            av[i] = dist(gen);
            cv[i] = dist(gen);
        }
        a.SetValues(av, Format::COEFFICIENT);
        c.SetValues(cv, Format::COEFFICIENT);
        for (size_t i = 0; i < N; ++i) {
            in[b * N + i] = av[i].ConvertToInt();
            in2[b * N + i] = cv[i].ConvertToInt();
        }
        NativePoly ae(a);
        ae.SetFormat(Format::EVALUATION);    // fwd transform, bit-rev order
        for (size_t i = 0; i < N; ++i)
            fwd[b * N + i] = ae.GetValues()[i].ConvertToInt();
        NativePoly ce(c);
        ce.SetFormat(Format::EVALUATION);
        NativePoly pe = ae * ce;             // negacyclic product
        pe.SetFormat(Format::COEFFICIENT);
        for (size_t i = 0; i < N; ++i)
            prod[b * N + i] = pe.GetValues()[i].ConvertToInt();
    }
    npy_save(dir + "/ntt_" + tag + "_in.npy", in, {B, N});
    npy_save(dir + "/ntt_" + tag + "_fwd.npy", fwd, {B, N});
    npy_save(dir + "/ntt_" + tag + "_in2.npy", in2, {B, N});
    npy_save(dir + "/ntt_" + tag + "_prod.npy", prod, {B, N});
    manifest_add("\"ntt_" + tag + "\": {\"N\": " + std::to_string(N) +
                 ", \"q\": " + std::to_string(q) +
                 ", \"psi\": " + std::to_string(psi) + "}");
}

static void dump_binfhe(const std::string& dir) {
    auto cc = BinFHEContext();
    cc.GenerateBinFHEContext(TOY, GINX);
    auto sk = cc.KeyGen();
    // BTKeyGen with the ring secret made explicit (mirrors
    // binfhe-base-scheme.cpp KeyGen:39-73) so skN can be dumped: the TPU
    // test then verifies blind rotation with the REFERENCE bootstrap key
    // and builds its own switching key for (sk, skN) -- committing the
    // reference KSK (39 MB of uniform randomness) is unnecessary.
    auto lweScheme = cc.GetLWEScheme();
    auto& bparams = *cc.GetParams();
    auto skN = lweScheme->KeyGen(bparams.GetLWEParams()->GetN(),
                                 bparams.GetLWEParams()->GetQ());
    RingGSWBTKey ek;
    ek.KSkey = lweScheme->KeySwitchGen(bparams.GetLWEParams(), sk, skN);
    NativePoly skNPoly(bparams.GetRingGSWParams()->GetPolyParams());
    NativeVector skNv(skN->GetElement());
    skNPoly.SetValues(std::move(skNv), Format::COEFFICIENT);
    skNPoly.SetFormat(Format::EVALUATION);
    ek.BSkey = RingGSWAccumulatorCGGI().KeyGenAcc(
        bparams.GetRingGSWParams(), skNPoly, sk);
    cc.BTKeyLoad(ek);

    auto& params = *cc.GetParams();
    auto& lwe = *params.GetLWEParams();
    auto& rgsw = *params.GetRingGSWParams();
    uint32_t n = lwe.Getn(), N = lwe.GetN();
    uint64_t q = lwe.Getq().ConvertToInt();
    uint64_t qKS = lwe.GetqKS().ConvertToInt();
    uint64_t Q = rgsw.GetQ().ConvertToInt();
    uint32_t baseKS = lwe.GetBaseKS();
    uint32_t baseG = rgsw.GetBaseG();
    uint32_t digitsG = rgsw.GetDigitsG();
    uint32_t dG2 = (digitsG - 1) << 1;

    // secret keys (values mod q / mod Q: ternary {0, 1, mod-1})
    npy_save(dir + "/tfhe_sk.npy", vec_of(sk->GetElement()), {n});
    npy_save(dir + "/tfhe_skN.npy", vec_of(skN->GetElement()), {N});

    // fresh LWE ciphertexts for bits, several per bit
    const size_t PER = 4;
    std::vector<uint64_t> cts_a(2 * PER * n), cts_b(2 * PER), msgs(2 * PER);
    for (int bit = 0; bit < 2; ++bit) {
        for (size_t r = 0; r < PER; ++r) {
            auto ct = cc.Encrypt(sk, bit);
            size_t row = bit * PER + r;
            auto av = vec_of(ct->GetA());
            std::copy(av.begin(), av.end(), cts_a.begin() + row * n);
            cts_b[row] = ct->GetB().ConvertToInt();
            msgs[row] = bit;
        }
    }
    npy_save(dir + "/tfhe_cts_a.npy", cts_a, {2 * PER, n});
    npy_save(dir + "/tfhe_cts_b.npy", cts_b, {2 * PER});
    npy_save(dir + "/tfhe_cts_m.npy", msgs, {2 * PER});

    // bootstrap key in COEFFICIENT format: [n, 2, dG2, 2, N]
    const auto& acc = *cc.GetRefreshKey();
    std::vector<uint64_t> bsk((size_t)n * 2 * dG2 * 2 * N);
    for (uint32_t i = 0; i < n; ++i) {
        for (uint32_t s = 0; s < 2; ++s) {
            const auto& ev = acc[0][s][i]->GetElements();   // [dG2][2] polys
            for (uint32_t r = 0; r < dG2; ++r) {
                for (uint32_t c = 0; c < 2; ++c) {
                    NativePoly p(ev[r][c]);
                    p.SetFormat(Format::COEFFICIENT);
                    size_t base =
                        ((((size_t)i * 2 + s) * dG2 + r) * 2 + c) * N;
                    for (uint32_t k = 0; k < N; ++k)
                        bsk[base + k] = p.GetValues()[k].ConvertToInt();
                }
            }
        }
    }
    npy_save(dir + "/tfhe_bsk_coef.npy", bsk, {n, 2, dG2, 2, N});

    // reference gate outputs on (bit0_ct0, bit1_ct0): AND OR XOR NAND
    std::vector<uint64_t> gates_a(4 * n), gates_b(4), gates_m(4);
    auto mk = [&](int bit, size_t r) {
        size_t row = bit * PER + r;
        NativeVector av(n, q);
        for (uint32_t i = 0; i < n; ++i) av[i] = cts_a[row * n + i];
        return std::make_shared<LWECiphertextImpl>(
            std::move(av), NativeInteger(cts_b[row]));
    };
    BINGATE ops[4] = {AND, OR, XOR, NAND};
    uint64_t expect[4] = {0, 1, 1, 1};          // on inputs (0, 1)
    for (int g = 0; g < 4; ++g) {
        auto out = cc.EvalBinGate(ops[g], mk(0, 0), mk(1, 0));
        auto av = vec_of(out->GetA());
        std::copy(av.begin(), av.end(), gates_a.begin() + g * n);
        gates_b[g] = out->GetB().ConvertToInt();
        LWEPlaintext dec;
        cc.Decrypt(sk, out, &dec);
        gates_m[g] = (uint64_t)dec;
        if ((uint64_t)dec != expect[g]) {
            std::fprintf(stderr, "reference gate %d decrypts wrong!\n", g);
            std::exit(2);
        }
    }
    npy_save(dir + "/tfhe_gateout_a.npy", gates_a, {4, n});
    npy_save(dir + "/tfhe_gateout_b.npy", gates_b, {4});
    npy_save(dir + "/tfhe_gateout_m.npy", gates_m, {4});

    manifest_add(std::string("\"tfhe\": {") +
                 "\"paramset\": \"TOY\", \"method\": \"GINX\"" +
                 ", \"n\": " + std::to_string(n) +
                 ", \"N\": " + std::to_string(N) +
                 ", \"q\": " + std::to_string(q) +
                 ", \"qKS\": " + std::to_string(qKS) +
                 ", \"Q\": " + std::to_string(Q) +
                 ", \"baseKS\": " + std::to_string(baseKS) +
                 ", \"baseG\": " + std::to_string(baseG) +
                 ", \"digitsG\": " + std::to_string(digitsG) +
                 ", \"gates\": [\"AND\", \"OR\", \"XOR\", \"NAND\"]" +
                 ", \"gate_inputs\": [0, 1]}");
}

int main(int argc, char** argv) {
    std::string dir = argc > 1 ? argv[1] : "tests/vectors";
    std::mt19937_64 gen(20260818);

    dump_ntt(dir, 1024, 27, "n1024_q27", gen);
    dump_ntt(dir, 2048, 27, "n2048_q27", gen);
    dump_ntt(dir, 4096, 28, "n4096_q28", gen);
    dump_binfhe(dir);

    std::ofstream mf(dir + "/manifest.json");
    mf << "{\n" << g_manifest << "\n}\n";
    std::printf("vectors written to %s\n", dir.c_str());
    return 0;
}
