// SPDX-License-Identifier: BSD-3-Clause
pragma solidity ^0.8.20;

import {FheOps, Precompile} from "./Precompile.sol";

/// @title Encrypted value handles
/// @notice 32-byte handles to ciphertexts held by the fhe_tpu coprocessor
///         (reference type surface: contracts/FHE.sol:8-57; the handle
///         indirection keeps chain state small while the TPU engine holds
///         the LWE/radix ciphertexts).
type ebool is uint256;
type euint8 is uint256;
type euint16 is uint256;
type euint32 is uint256;
type euint64 is uint256;
type euint128 is uint256;
type euint256 is uint256;
type eaddress is uint256;

/// @notice User-supplied encrypted inputs carry the serialized ciphertext
///         plus the security zone whose network key encrypted it.
struct inEbool    { bytes data; int32 securityZone; }
struct inEuint8   { bytes data; int32 securityZone; }
struct inEuint16  { bytes data; int32 securityZone; }
struct inEuint32  { bytes data; int32 securityZone; }
struct inEuint64  { bytes data; int32 securityZone; }
struct inEuint128 { bytes data; int32 securityZone; }
struct inEuint256 { bytes data; int32 securityZone; }
struct inEaddress { bytes data; int32 securityZone; }

/// @title Type tags shared with the coprocessor (fhe_tpu FheType order)
library Types {
    uint8 internal constant EBOOL    = 0;
    uint8 internal constant EUINT8   = 2;
    uint8 internal constant EUINT16  = 3;
    uint8 internal constant EUINT32  = 4;
    uint8 internal constant EUINT64  = 5;
    uint8 internal constant EUINT128 = 6;
    uint8 internal constant EUINT256 = 7;
    uint8 internal constant EADDRESS = 8;
}

/// @title FHE convenience library
/// @notice Thin typed wrappers over the FheOps precompile.  Only the
///         euint32 family is spelled out; the other widths follow the
///         same pattern with their Types tag.
library FHE {
    FheOps internal constant ops = FheOps(Precompile.FHE);

    function _h(bytes memory handle) private pure returns (uint256 h) {
        assembly { h := mload(add(handle, 32)) }
    }

    function _b(uint256 handle) private pure returns (bytes memory out) {
        out = new bytes(32);
        assembly { mstore(add(out, 32), handle) }
    }

    // -- input / output ------------------------------------------------------
    function asEuint32(inEuint32 memory input)
        internal returns (euint32) {
        return euint32.wrap(_h(ops.verify(Types.EUINT32, input.data,
                                          input.securityZone)));
    }

    function asEuint32(uint32 value) internal returns (euint32) {
        return euint32.wrap(_h(ops.trivialEncrypt(
            abi.encodePacked(uint256(value)), Types.EUINT32, 0)));
    }

    function decrypt(euint32 v) internal returns (uint32) {
        return uint32(ops.decrypt(Types.EUINT32, _b(euint32.unwrap(v)), 0));
    }

    function decrypt(ebool v) internal returns (bool) {
        return ops.decrypt(Types.EBOOL, _b(ebool.unwrap(v)), 0) != 0;
    }

    // -- arithmetic ----------------------------------------------------------
    function add(euint32 a, euint32 b) internal returns (euint32) {
        return euint32.wrap(_h(ops.add(Types.EUINT32,
            _b(euint32.unwrap(a)), _b(euint32.unwrap(b)))));
    }

    function sub(euint32 a, euint32 b) internal returns (euint32) {
        return euint32.wrap(_h(ops.sub(Types.EUINT32,
            _b(euint32.unwrap(a)), _b(euint32.unwrap(b)))));
    }

    function mul(euint32 a, euint32 b) internal returns (euint32) {
        return euint32.wrap(_h(ops.mul(Types.EUINT32,
            _b(euint32.unwrap(a)), _b(euint32.unwrap(b)))));
    }

    // -- comparison ----------------------------------------------------------
    function eq(euint32 a, euint32 b) internal returns (ebool) {
        return ebool.wrap(_h(ops.eq(Types.EUINT32,
            _b(euint32.unwrap(a)), _b(euint32.unwrap(b)))));
    }

    function lt(euint32 a, euint32 b) internal returns (ebool) {
        return ebool.wrap(_h(ops.lt(Types.EUINT32,
            _b(euint32.unwrap(a)), _b(euint32.unwrap(b)))));
    }

    function gt(euint32 a, euint32 b) internal returns (ebool) {
        return ebool.wrap(_h(ops.gt(Types.EUINT32,
            _b(euint32.unwrap(a)), _b(euint32.unwrap(b)))));
    }

    // -- bitwise / control ---------------------------------------------------
    function and(euint32 a, euint32 b) internal returns (euint32) {
        return euint32.wrap(_h(ops.and(Types.EUINT32,
            _b(euint32.unwrap(a)), _b(euint32.unwrap(b)))));
    }

    function xor(euint32 a, euint32 b) internal returns (euint32) {
        return euint32.wrap(_h(ops.xor(Types.EUINT32,
            _b(euint32.unwrap(a)), _b(euint32.unwrap(b)))));
    }

    function select(ebool cond, euint32 a, euint32 b)
        internal returns (euint32) {
        return euint32.wrap(_h(ops.select(Types.EUINT32,
            _b(ebool.unwrap(cond)), _b(euint32.unwrap(a)),
            _b(euint32.unwrap(b)))));
    }
}
