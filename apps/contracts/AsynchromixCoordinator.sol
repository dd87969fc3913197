// SPDX-License-Identifier: MIT
pragma solidity ^0.8.20;

/// @title AsynchromixCoordinator — on-chain MPC coordinator for the
/// Asynchromix mixing service.
///
/// Role parity with the reference coordinator
/// (reference apps/asynchromix/asynchromix.sol, re-implemented fresh in
/// 0.8 idiom): it (1) tracks the servers' preprocessing buffer as the
/// MINIMUM of per-server reports, (2) lets clients reserve input masks and
/// bind masked messages to them, and (3) initiates fixed-size mixing
/// epochs and certifies outputs once t+1 identical server votes arrive.
///
/// The off-chain drivers (apps/asynchromix.py) speak to this surface only
/// through calls + emitted events; an in-process double with the same
/// state machine (apps/evm_double.py) stands in when no chain is present.
contract AsynchromixCoordinator {
    uint256 public immutable n;
    uint256 public immutable t;
    address[] public servers;
    mapping(address => uint256) public servermap; // id + 1; 0 = not a server

    // Mix size and per-epoch preprocessing demand: a K-input butterfly
    // network has (K/2)·log2(K)^2 switches, one triple + one ±1 bit each.
    uint256 public immutable K;
    uint256 public immutable PER_MIX_TRIPLES;
    uint256 public immutable PER_MIX_BITS;

    struct PreProcessCount {
        uint256 triples;    // [a],[b],[ab]
        uint256 bits;       // [b], b in {-1, 1}
        uint256 inputmasks; // [r]
    }

    PreProcessCount public preprocess;      // consensus: min over reports
    PreProcessCount public preprocessUsed;  // reserved so far
    mapping(uint256 => PreProcessCount) public preprocessReports;

    // input masks -> claiming client; cleared after first use
    mapping(uint256 => address) public inputmasksClaimed;

    struct Input {
        bytes32 maskedInput; // m + r
        uint256 inputmask;   // index of [r]
    }
    Input[] public inputQueue;

    uint256 public inputsMixed;
    uint256 public epochsInitiated;
    uint256 public outputsReady;
    bytes32[] public outputHashes;
    uint256[] public outputVotes;
    mapping(uint256 => uint256) public serverVoted; // next epoch this server may vote in

    event PreProcessUpdated();
    event InputMaskClaimed(address indexed client, uint256 inputmaskIdx);
    event MessageSubmitted(uint256 idx, uint256 inputmaskIdx, bytes32 maskedInput);
    event MixingEpochInitiated(uint256 epoch);
    event MixOutput(uint256 epoch, string output);

    constructor(address[] memory _servers, uint256 _t, uint256 _k) {
        require(_servers.length > 3 * _t, "need n > 3t");
        require(_k > 0 && (_k & (_k - 1)) == 0, "K must be a power of two");
        n = _servers.length;
        t = _t;
        K = _k;
        uint256 logk = 0;
        while ((uint256(1) << logk) < _k) logk++;
        PER_MIX_TRIPLES = (_k / 2) * logk * logk;
        PER_MIX_BITS = (_k / 2) * logk * logk;
        for (uint256 i = 0; i < _servers.length; i++) {
            servers.push(_servers[i]);
            servermap[_servers[i]] = i + 1;
        }
    }

    // ------------------------------------------------------------------
    // 1. Preprocessing buffer
    // ------------------------------------------------------------------

    function inputmasks_available() public view returns (uint256) {
        return preprocess.inputmasks - preprocessUsed.inputmasks;
    }

    function mixes_available() public view returns (uint256) {
        uint256 byTriples =
            (preprocess.triples - preprocessUsed.triples) / PER_MIX_TRIPLES;
        uint256 byBits = (preprocess.bits - preprocessUsed.bits) / PER_MIX_BITS;
        return byTriples < byBits ? byTriples : byBits;
    }

    /// Per-server report of (triples, bits, inputmasks) on hand; the
    /// consensus buffer is the coordinate-wise minimum over all servers.
    function preprocess_report(uint256[3] calldata rep) external {
        uint256 mapped = servermap[msg.sender];
        require(mapped > 0, "not a server");
        preprocessReports[mapped - 1] =
            PreProcessCount(rep[0], rep[1], rep[2]);

        PreProcessCount memory mins = preprocessReports[0];
        for (uint256 i = 1; i < n; i++) {
            PreProcessCount storage r = preprocessReports[i];
            if (r.triples < mins.triples) mins.triples = r.triples;
            if (r.bits < mins.bits) mins.bits = r.bits;
            if (r.inputmasks < mins.inputmasks) mins.inputmasks = r.inputmasks;
        }
        bool grew = mins.triples > preprocess.triples ||
            mins.bits > preprocess.bits ||
            mins.inputmasks > preprocess.inputmasks;
        preprocess = mins;
        if (grew) emit PreProcessUpdated();
    }

    // ------------------------------------------------------------------
    // 2. Client input
    // ------------------------------------------------------------------

    /// Reserve the next unclaimed input mask for msg.sender.
    function reserve_inputmask() external returns (uint256 idx) {
        require(preprocess.inputmasks > preprocessUsed.inputmasks,
                "no masks available");
        idx = preprocessUsed.inputmasks;
        inputmasksClaimed[idx] = msg.sender;
        preprocessUsed.inputmasks += 1;
        emit InputMaskClaimed(msg.sender, idx);
    }

    /// Servers check a client's share request against this (the share
    /// itself travels off-chain).
    function client_authorized(address client, uint256 idx)
        external view returns (bool)
    {
        return inputmasksClaimed[idx] == client;
    }

    /// Publish the masked message m + r, binding it to mask idx.
    function submit_message(uint256 inputmaskIdx, bytes32 maskedInput)
        external
    {
        require(inputmasksClaimed[inputmaskIdx] == msg.sender,
                "mask not claimed by sender");
        inputQueue.push(Input(maskedInput, inputmaskIdx));
        emit MessageSubmitted(inputQueue.length - 1, inputmaskIdx, maskedInput);
        delete inputmasksClaimed[inputmaskIdx]; // single use
    }

    function input_queue_length() external view returns (uint256) {
        return inputQueue.length;
    }

    function inputs_ready() public view returns (uint256) {
        return inputQueue.length - inputsMixed;
    }

    // ------------------------------------------------------------------
    // 3. Mixing epochs
    // ------------------------------------------------------------------

    /// Anyone may trigger an epoch once K inputs and one epoch's worth of
    /// preprocessing are available.
    function initiate_mix() external {
        require(inputQueue.length >= inputsMixed + K, "need K inputs");
        require(preprocess.triples >=
                preprocessUsed.triples + PER_MIX_TRIPLES, "need triples");
        require(preprocess.bits >= preprocessUsed.bits + PER_MIX_BITS,
                "need bits");
        preprocessUsed.triples += PER_MIX_TRIPLES;
        preprocessUsed.bits += PER_MIX_BITS;
        inputsMixed += K;
        emit MixingEpochInitiated(epochsInitiated);
        epochsInitiated += 1;
        outputHashes.push(bytes32(0));
        outputVotes.push(0);
    }

    /// A server proposes the epoch's output; at t+1 identical votes the
    /// output is certified (at least one honest server agrees). Votes must
    /// arrive in strictly ascending epoch order per server.
    function propose_output(uint256 epoch, string calldata output) external {
        require(epoch < epochsInitiated, "epoch not initiated");
        uint256 mapped = servermap[msg.sender];
        require(mapped > 0, "not a server");
        uint256 id = mapped - 1;
        require(epoch >= serverVoted[id], "already voted this epoch");
        serverVoted[id] = epoch + 1;

        bytes32 h = keccak256(bytes(output));
        if (outputVotes[epoch] > 0) {
            require(h == outputHashes[epoch], "conflicting output");
        } else {
            outputHashes[epoch] = h;
        }
        outputVotes[epoch] += 1;
        if (outputVotes[epoch] == t + 1) {
            emit MixOutput(epoch, output);
            outputsReady += 1;
        }
    }

    function outputs_ready() external view returns (uint256) {
        return outputsReady;
    }

    function epochs_initiated() external view returns (uint256) {
        return epochsInitiated;
    }
}
