// PKE cereal-archive dumper: serializes REFERENCE CKKS objects with the
// reference's own cereal stack (utils/serial.h SERBINARY + SERJSON) so
// fhe_tpu.utils.serial_ref can (a) parse them into fhe_tpu objects and
// decrypt through OUR math stack and (b) write byte-identical archives
// back (the round-trip test).
//
// Objects dumped (small FIXEDMANUAL CKKS context, N=512, depth 2):
//   pke_ct.{bin,json}      fresh ciphertext (Ciphertext<DCRTPoly>)
//   pke_ct2.{bin,json}     EvalMult+Rescale result
//   pke_sk.{bin,json}      secret key (PrivateKey<DCRTPoly>)
//   pke_pk.{bin,json}      public key
//   pke_cc.{bin,json}      the CryptoContext itself
//   pke_values.npy         the encoded slot values (float64)
//   manifest_pke_ser.json  scale/slots metadata
//
// Build (reference built at /tmp/refbuild; cereal from the install tree):
//   g++ -O2 -std=c++17 tools/ref_pke_ser_dump.cpp -o /tmp/ref_pke_ser_dump \
//     -I/root/reference/src/core/include -I/root/reference/src/pke/include \
//     -I/root/reference/src/binfhe/include -I/tmp/refbuild/src/core \
//     -I/root/reference/install/include/openfhe \
//     -L/tmp/refbuild/lib -lFHEpke -lFHEcore -fopenmp \
//     -Wl,-rpath,/tmp/refbuild/lib
//   /tmp/ref_pke_ser_dump tests/vectors

#include <cmath>
#include <fstream>
#include <iomanip>
#include <sstream>
#include <string>
#include <vector>

#include "openfhe.h"
#include "ciphertext-ser.h"
#include "cryptocontext-ser.h"
#include "key/key-ser.h"
#include "scheme/ckksrns/ckksrns-ser.h"

using namespace lux::fhe;

template <typename T>
static void npy_write_f8(const std::string& path, const std::vector<T>& data) {
    std::ostringstream hdr;
    hdr << "{'descr': '<f8', 'fortran_order': False, 'shape': ("
        << data.size() << ",), }";
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
    f.write(reinterpret_cast<const char*>(data.data()),
            data.size() * sizeof(T));
}

int main(int argc, char** argv) {
    std::string dir = argc > 1 ? argv[1] : "tests/vectors";

    CCParams<CryptoContextCKKSRNS> parameters;
    parameters.SetMultiplicativeDepth(2);
    parameters.SetScalingModSize(40);
    parameters.SetFirstModSize(50);
    parameters.SetScalingTechnique(FIXEDMANUAL);
    parameters.SetRingDim(512);
    parameters.SetSecurityLevel(HEStd_NotSet);
    parameters.SetBatchSize(256);

    CryptoContext<DCRTPoly> cc = GenCryptoContext(parameters);
    cc->Enable(PKE);
    cc->Enable(LEVELEDSHE);
    auto keys = cc->KeyGen();
    cc->EvalMultKeyGen(keys.secretKey);

    size_t slots = 256;
    std::vector<double> vals(slots);
    for (size_t i = 0; i < slots; ++i)
        vals[i] = std::sin(0.05 * double(i)) * 0.5;
    Plaintext pt = cc->MakeCKKSPackedPlaintext(vals);
    auto ct = cc->Encrypt(keys.publicKey, pt);
    auto ct2 = cc->Rescale(cc->EvalMult(ct, ct));

    Serial::SerializeToFile(dir + "/pke_ct.bin", ct, SerType::BINARY);
    Serial::SerializeToFile(dir + "/pke_ct.json", ct, SerType::JSON);
    Serial::SerializeToFile(dir + "/pke_ct2.bin", ct2, SerType::BINARY);
    Serial::SerializeToFile(dir + "/pke_ct2.json", ct2, SerType::JSON);
    Serial::SerializeToFile(dir + "/pke_sk.bin", keys.secretKey,
                            SerType::BINARY);
    Serial::SerializeToFile(dir + "/pke_sk.json", keys.secretKey,
                            SerType::JSON);
    Serial::SerializeToFile(dir + "/pke_pk.bin", keys.publicKey,
                            SerType::BINARY);
    Serial::SerializeToFile(dir + "/pke_pk.json", keys.publicKey,
                            SerType::JSON);
    Serial::SerializeToFile(dir + "/pke_cc.bin", cc, SerType::BINARY);
    Serial::SerializeToFile(dir + "/pke_cc.json", cc, SerType::JSON);

    npy_write_f8(dir + "/pke_ser_values.npy", vals);
    double scale = ct->GetScalingFactor();
    std::ofstream mf(dir + "/manifest_pke_ser.json");
    mf << "{\n  \"ring_dim\": 512,\n  \"slots\": 256,\n  \"scale\": "
       << std::setprecision(17) << scale << ",\n  \"scale2\": "
       << ct2->GetScalingFactor() << ",\n  \"depth\": 2\n}\n";
    return 0;
}
