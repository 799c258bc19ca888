// PKE-side cross-implementation known-answer-vector dumper.
//
// Links the REFERENCE pke stack (FHEpke/FHEcore, MATHBACKEND=4) and dumps
// raw COEFFICIENT-format ciphertexts + secret keys so the TPU framework
// can replay decryption through its own RNS/NTT layers
// (tests/test_reference_kat.py::TestPkeKat):
//
//   * CKKS (FIXEDMANUAL): ct(c0,c1) + sk limbs + moduli chain + scale +
//     input values -- the TPU side computes phase = c0 + c1*s with its
//     own negacyclic NTT on the REFERENCE's moduli, CRT-composes,
//     centers, and decodes with its own canonical embedding;
//   * BFV (HPS) / BGV coef-packed: exact integer decrypt must reproduce
//     the message verbatim (no float tolerance);
//   * serialization interop blobs: the reference's own cereal SERJSON +
//     SERBINARY archives of an LWE ciphertext (utils/serial.h:119,166)
//     for fhe_tpu.utils.serial_ref to parse directly.
//
// Build (reference built at /tmp/refbuild -- see tools/ref_kat_dump.cpp):
//   g++ -O2 -std=c++17 tools/ref_pke_kat_dump.cpp -o /tmp/ref_pke_kat_dump \
//     -I/root/reference/src/core/include -I/root/reference/src/pke/include \
//     -I/root/reference/src/binfhe/include \
//     -I/tmp/refbuild/src/core -I/root/reference/install/include/openfhe \
//     -L/tmp/refbuild/lib -lFHEpke -lFHEbin -lFHEcore -fopenmp \
//     -Wl,-rpath,/tmp/refbuild/lib
//   /tmp/ref_pke_kat_dump tests/vectors

#include <cstdint>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "openfhe.h"
#include "binfhecontext.h"
#include "binfhecontext-ser.h"

using namespace lux::fhe;

// ---------------------------------------------------------------------------
// .npy writers ('<u8' for RNS values, '<f8' for doubles)
// ---------------------------------------------------------------------------
template <typename T>
static void npy_write(const std::string& path, const char* descr,
                      const std::vector<T>& data,
                      const std::vector<size_t>& shape) {
    std::ostringstream hdr;
    hdr << "{'descr': '" << descr << "', 'fortran_order': False, 'shape': (";
    for (size_t i = 0; i < shape.size(); ++i) {
        hdr << shape[i];
        if (shape.size() == 1 || i + 1 < shape.size())
            hdr << (shape.size() == 1 ? "," : ", ");
    }
    hdr << "), }";
    std::string h = hdr.str();
    size_t total = 10 + h.size() + 1;
    size_t pad = (64 - (total % 64)) % 64;
    h += std::string(pad, ' ');
    h += '\n';
    uint16_t hlen = static_cast<uint16_t>(h.size());
    std::ofstream f(path, std::ios::binary);
    f.write("\x93NUMPY\x01\x00", 8);
    f.write(reinterpret_cast<const char*>(&hlen), 2);
    f.write(h.data(), h.size());
    f.write(reinterpret_cast<const char*>(data.data()), data.size() * sizeof(T));
}

static std::string g_manifest;
static void manifest_add(const std::string& kv) {
    if (!g_manifest.empty()) g_manifest += ",\n";
    g_manifest += "  " + kv;
}

// flatten a DCRTPoly (COEFFICIENT format) to [L, N] uint64
static std::vector<uint64_t> dcrt_values(DCRTPoly p) {
    p.SetFormat(Format::COEFFICIENT);
    const auto& towers = p.GetAllElements();
    size_t L = towers.size(), N = towers[0].GetLength();
    std::vector<uint64_t> out(L * N);
    for (size_t l = 0; l < L; ++l)
        for (size_t i = 0; i < N; ++i)
            out[l * N + i] = towers[l].GetValues()[i].ConvertToInt();
    return out;
}

static std::vector<uint64_t> chain_moduli(const DCRTPoly& p) {
    std::vector<uint64_t> mods;
    for (const auto& t : p.GetAllElements())
        mods.push_back(t.GetModulus().ConvertToInt());
    return mods;
}

// ---------------------------------------------------------------------------

static void dump_ckks(const std::string& dir) {
    CCParams<CryptoContextCKKSRNS> parameters;
    parameters.SetMultiplicativeDepth(3);
    parameters.SetScalingModSize(40);
    parameters.SetFirstModSize(50);
    parameters.SetScalingTechnique(FIXEDMANUAL);
    parameters.SetRingDim(4096);
    parameters.SetSecurityLevel(HEStd_NotSet);
    parameters.SetBatchSize(2048);

    CryptoContext<DCRTPoly> cc = GenCryptoContext(parameters);
    cc->Enable(PKE);
    cc->Enable(LEVELEDSHE);
    auto keys = cc->KeyGen();
    cc->EvalMultKeyGen(keys.secretKey);

    size_t slots = 2048;
    std::vector<double> vals(slots);
    for (size_t i = 0; i < slots; ++i)
        vals[i] = std::sin(0.01 * double(i)) * 0.75;
    Plaintext pt = cc->MakeCKKSPackedPlaintext(vals);
    auto ct = cc->Encrypt(keys.publicKey, pt);

    // one homomorphic square + rescale so the KAT also covers EvalMult
    auto ct2 = cc->EvalMult(ct, ct);
    ct2 = cc->Rescale(ct2);

    DCRTPoly s = keys.secretKey->GetPrivateElement();
    auto mods = chain_moduli(s);
    size_t N = s.GetAllElements()[0].GetLength();

    npy_write(dir + "/ckks_moduli.npy", "<u8", mods, {mods.size()});
    npy_write(dir + "/ckks_sk.npy", "<u8", dcrt_values(s),
              {mods.size(), N});
    const auto& els = ct->GetElements();
    npy_write(dir + "/ckks_ct_c0.npy", "<u8", dcrt_values(els[0]),
              {chain_moduli(els[0]).size(), N});
    npy_write(dir + "/ckks_ct_c1.npy", "<u8", dcrt_values(els[1]),
              {chain_moduli(els[1]).size(), N});
    const auto& els2 = ct2->GetElements();
    npy_write(dir + "/ckks_ct2_c0.npy", "<u8", dcrt_values(els2[0]),
              {chain_moduli(els2[0]).size(), N});
    npy_write(dir + "/ckks_ct2_c1.npy", "<u8", dcrt_values(els2[1]),
              {chain_moduli(els2[1]).size(), N});
    npy_write(dir + "/ckks_values.npy", "<f8", vals, {slots});

    std::ostringstream meta;
    meta << "\"ckks\": {\"N\": " << N << ", \"slots\": " << slots
         << ", \"scale_bits\": 40"
         << ", \"ct2_scale_bits\": " << std::log2(ct2->GetScalingFactor())
         << ", \"levels\": " << mods.size() << "}";
    manifest_add(meta.str());
}

template <typename SchemeParams>
static void dump_exact(const std::string& dir, const std::string& tag,
                       bool fixed_scaling) {
    CCParams<SchemeParams> parameters;
    parameters.SetPlaintextModulus(65537);
    parameters.SetMultiplicativeDepth(2);
    parameters.SetRingDim(4096);
    parameters.SetSecurityLevel(HEStd_NotSet);
    // FIXEDMANUAL keeps fresh BGV ciphertexts scale-free so the replay is
    // a pure phase-mod-t decrypt (the FLEXIBLEAUTOEXT default multiplies
    // the plaintext by a level scale factor); BFV has no such knob.
    if (fixed_scaling)
        parameters.SetScalingTechnique(FIXEDMANUAL);

    CryptoContext<DCRTPoly> cc = GenCryptoContext(parameters);
    cc->Enable(PKE);
    cc->Enable(LEVELEDSHE);
    auto keys = cc->KeyGen();

    size_t N = cc->GetRingDimension();
    std::vector<int64_t> msg(N);
    for (size_t i = 0; i < N; ++i)
        msg[i] = int64_t((i * 2654435761u) % 65537) - 32768;  // centered
    Plaintext pt = cc->MakeCoefPackedPlaintext(msg);
    auto ct = cc->Encrypt(keys.publicKey, pt);

    DCRTPoly s = keys.secretKey->GetPrivateElement();
    auto mods = chain_moduli(s);
    npy_write(dir + "/" + tag + "_moduli.npy", "<u8", mods, {mods.size()});
    npy_write(dir + "/" + tag + "_sk.npy", "<u8", dcrt_values(s),
              {mods.size(), N});
    const auto& els = ct->GetElements();
    npy_write(dir + "/" + tag + "_ct_c0.npy", "<u8", dcrt_values(els[0]),
              {chain_moduli(els[0]).size(), N});
    npy_write(dir + "/" + tag + "_ct_c1.npy", "<u8", dcrt_values(els[1]),
              {chain_moduli(els[1]).size(), N});
    std::vector<uint64_t> m64(N);
    for (size_t i = 0; i < N; ++i)
        m64[i] = uint64_t((msg[i] % 65537 + 65537) % 65537);
    npy_write(dir + "/" + tag + "_msg.npy", "<u8", m64, {N});

    std::ostringstream meta;
    meta << "\"" << tag << "\": {\"N\": " << N << ", \"t\": 65537"
         << ", \"levels\": " << mods.size() << "}";
    manifest_add(meta.str());
}

// ---------------------------------------------------------------------------
// serialization interop: the reference's own cereal archives
// ---------------------------------------------------------------------------
static void dump_serial(const std::string& dir) {
    auto ctx = BinFHEContext();
    ctx.GenerateBinFHEContext(TOY, GINX);
    auto sk = ctx.KeyGen();
    auto ct0 = ctx.Encrypt(sk, 0);
    auto ct1 = ctx.Encrypt(sk, 1);

    Serial::SerializeToFile(dir + "/serial_lwe_ct0.json", ct0, SerType::JSON);
    Serial::SerializeToFile(dir + "/serial_lwe_ct1.json", ct1, SerType::JSON);
    Serial::SerializeToFile(dir + "/serial_lwe_ct0.bin", ct0, SerType::BINARY);
    Serial::SerializeToFile(dir + "/serial_lwe_ct1.bin", ct1, SerType::BINARY);

    // raw secret + params so the TPU side can decrypt what it parses
    const auto& skv = sk->GetElement();
    std::vector<uint64_t> skd(skv.GetLength());
    for (size_t i = 0; i < skv.GetLength(); ++i)
        skd[i] = skv[i].ConvertToInt();
    npy_write(dir + "/serial_lwe_sk.npy", "<u8", skd, {skd.size()});

    std::ostringstream meta;
    meta << "\"serial_lwe\": {\"n\": " << skv.GetLength()
         << ", \"q\": " << ctx.GetParams()->GetLWEParams()->Getq().ConvertToInt()
         << ", \"bits\": [0, 1]}";
    manifest_add(meta.str());
}

int main(int argc, char** argv) {
    std::string dir = argc > 1 ? argv[1] : "tests/vectors";
    dump_ckks(dir);
    dump_exact<CryptoContextBFVRNS>(dir, "bfv", false);
    dump_exact<CryptoContextBGVRNS>(dir, "bgv", true);
    dump_serial(dir);
    std::ofstream mf(dir + "/manifest_pke.json");
    mf << "{\n" << g_manifest << "\n}\n";
    printf("PKE KAT vectors written to %s\n", dir.c_str());
    return 0;
}
