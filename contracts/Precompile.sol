// SPDX-License-Identifier: BSD-3-Clause
pragma solidity ^0.8.20;

/// @title FHE precompile location
/// @notice The fhe_tpu coprocessor is exposed to the EVM as a stateful
///         precompile at address 0x80, matching the reference deployment
///         (reference: contracts/Precompile.sol:5-7).  Ciphertexts live
///         off-chain in the coprocessor; the chain stores 32-byte handles.
library Precompile {
    address internal constant FHE = address(128);
}

/// @title Operations served by the FHE coprocessor
/// @dev Every binary operation takes two ciphertext handles (as returned
///      by verify/trivialEncrypt or earlier ops) plus the operand type
///      tag, and returns the handle of the result.  The coprocessor
///      batches operations across transactions onto the TPU engine
///      (fhe_tpu.tfhe.fhevm.FheContext).
interface FheOps {
    // -- input handling ------------------------------------------------------
    function verify(uint8 utype, bytes calldata input, int32 securityZone)
        external returns (bytes memory handle);

    function trivialEncrypt(bytes calldata value, uint8 toType,
                            int32 securityZone)
        external returns (bytes memory handle);

    function decrypt(uint8 utype, bytes calldata handle,
                     uint256 defaultValue) external returns (uint256);

    function sealOutput(uint8 utype, bytes calldata handle,
                        bytes calldata publicKey)
        external returns (string memory);

    function getNetworkPublicKey(int32 securityZone)
        external returns (bytes memory);

    // -- arithmetic ----------------------------------------------------------
    function add(uint8 utype, bytes calldata a, bytes calldata b)
        external returns (bytes memory);
    function sub(uint8 utype, bytes calldata a, bytes calldata b)
        external returns (bytes memory);
    function mul(uint8 utype, bytes calldata a, bytes calldata b)
        external returns (bytes memory);

    // -- comparison (result is an ebool handle) ------------------------------
    function eq(uint8 utype, bytes calldata a, bytes calldata b)
        external returns (bytes memory);
    function ne(uint8 utype, bytes calldata a, bytes calldata b)
        external returns (bytes memory);
    function lt(uint8 utype, bytes calldata a, bytes calldata b)
        external returns (bytes memory);
    function lte(uint8 utype, bytes calldata a, bytes calldata b)
        external returns (bytes memory);
    function gt(uint8 utype, bytes calldata a, bytes calldata b)
        external returns (bytes memory);
    function gte(uint8 utype, bytes calldata a, bytes calldata b)
        external returns (bytes memory);

    // -- bitwise -------------------------------------------------------------
    function and(uint8 utype, bytes calldata a, bytes calldata b)
        external returns (bytes memory);
    function or(uint8 utype, bytes calldata a, bytes calldata b)
        external returns (bytes memory);
    function xor(uint8 utype, bytes calldata a, bytes calldata b)
        external returns (bytes memory);
    function not(uint8 utype, bytes calldata a)
        external returns (bytes memory);

    // -- control -------------------------------------------------------------
    function select(uint8 utype, bytes calldata cond, bytes calldata a,
                    bytes calldata b) external returns (bytes memory);
    function cast(uint8 fromType, bytes calldata a, uint8 toType)
        external returns (bytes memory);

    // -- randomness ----------------------------------------------------------
    function random(uint8 utype, uint64 seed, int32 securityZone)
        external returns (bytes memory);
}
