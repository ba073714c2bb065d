"""Golden MD5 digests copied verbatim from the reference test suite.

These constants pin down the full bit-exactness contract for both NTTs:
  * ADDITIVE_NTT_HASHES[log_rate][log_h]: src/ulvt/ntt/tests/test_ntt.cu:52-124
    (log_rate 0: log_h 1..30; log_rate 2: log_h 1..27)
  * BB31_NTT_HASHES[log_len]: src/ulvt/ntt/tests/test_ntt.cu:21-50
    (log_len 1..27)

Inputs are the raw std::mt19937 uint32 stream with seed
0xdeadbeef + log_h + log_rate (additive, test_ntt.cu:192) or
0xdeadbeef + log_len (BB31, test_ntt.cu:128); digests are MD5 over the output
words in little-endian byte order (test_ntt.cu:143-150, :208-215).
"""

ADDITIVE_NTT_HASHES = {
    0: {
        1: "6c674a56275dfd6baf965163d6d4757a",
        2: "373b753b3e053d128cb53ac23f403a1c",
        3: "0933fa26689378684a4f6a4654deed44",
        4: "3f8d244dc683e58534c8a1bef2284127",
        5: "2f72470ce905c9261380bac9232db7ae",
        6: "a22e4b3ae73b2a7c4443288e7f8fdfca",
        7: "81179f7e33b4522b20bacba9c07db9cd",
        8: "fb4c3004906ef7d59d5c5a5a0485e290",
        9: "d04bcce5c7d1a85995a9e9a654b58323",
        10: "191e2bc2ee655300c27f7c244952c0b7",
        11: "e54f055f6bbf6c631d8b186f38ce2d14",
        12: "61fcc43ee52bbdb6e27ae5858281c9be",
        13: "bd00577580a855db62509d1b0b46ab6d",
        14: "d4730090c2573bd39ee269141dc36d44",
        15: "9ddb7132cc222081dee26db8b0376d0a",
        16: "66f04110ea24ae09e742bcd36152e780",
        17: "a3213ac417290e9778d1c85e8a274f82",
        18: "4e8e21289f55cf528430f68fc3c1a8e8",
        19: "d3710a4a4fca93eec2b845943958922e",
        20: "e6ba17d43f8862510edd3fec1648c7ef",
        21: "e04156c7aca2d75106a76cae8819f568",
        22: "45befb3c293f30a0bbf4040b2869b0d8",
        23: "f7c0d89ccae001fdd68da687954b0070",
        24: "3ddcc9b42859c8c9f9be5c6cb5bd9ea9",
        25: "2bdca01c18c8d64205eb7a0ca85e649d",
        26: "cec931e20b31184b270ae03651186cf8",
        27: "fb8c005b989e3e02e1b0f1e175910882",
        28: "da7562b46e0b01184f8baf2aea57826d",
        29: "be01e510e4cf06b7a26437e8c2b28dc6",
        30: "d449c74e930c90a77dc63ad2aed2b7ac",
    },
    2: {
        1: "e587a708f529f1472b296a235ae2f40d",
        2: "0ffb30a0f51c53219fee9d72f403419a",
        3: "14c058114381d1c296c69fb1170fa7b3",
        4: "45f019d145fe718a9fcfca61afe01629",
        5: "3dd7ee36770b9ff6787952620350e239",
        6: "46fc2a6ed83d1ed0f8cfd0884ac64868",
        7: "e666f014cd8c2e05cedf81c10b623b7b",
        8: "d891538df83115c18248dd7877454be2",
        9: "1a4cac205d46ad1346e477d579bd00f6",
        10: "fdb3c68b3b14f6a829cf559cdeee5144",
        11: "9f60b7aec4f46ca3d1e1e072551163d0",
        12: "82860b5c36f97b115836f8c0617f1e5a",
        13: "94ec8f80b91a505e7d40f9b63062930b",
        14: "2c56a11200b3c2261f1ffa4b86744018",
        15: "ed083fe4e5b78d4db3b4b5a36bec7343",
        16: "4243ab6805b18bed72f3980a8faa5cea",
        17: "17aa87d8c90b6eb4e7a6a700d5fdc4e0",
        18: "6f694eeda8791b5fa315e0205090f533",
        19: "294a7028b539305c276a2a46677effb2",
        20: "53e8a086be97f61f43930357442272cb",
        21: "3b9a01494191fb8f1e4110da687e3960",
        22: "bb8ddac3b266ae36c54ce3e5bf1317bb",
        23: "4aa29b0fd75f03bf81691000d3492188",
        24: "6ed372769cb72a37bab2be08668b0ee3",
        25: "1d8393290c848c751faa4c5e6a72588b",
        26: "5d6b1bb6aad12ffd4ba4b1466cd2a70d",
        27: "5a22170b4eb1ac6ef4b1d703fadab4f8",
    },
}

BB31_NTT_HASHES = {
    1: "1421731a0a5a5a5d6fbc7bcde6025dad",
    2: "692068c81479f85618d43aaed9a8271c",
    3: "853f1443dc874462d58258ec87a42f46",
    4: "7be2e236653c45219336d24f8393d9d6",
    5: "39fec27f1e58f4b52a30c2a76f705793",
    6: "38cf038b603cc560d94ea254a97a07d2",
    7: "17b9b369fe0630e2ec58577491c464ea",
    8: "01ad3926837e9933539134bb0152a860",
    9: "855515ba83b0eca3871a324b12350e48",
    10: "246ebb7b85827615bfabfb22a29d5668",
    11: "36648355573b93fe08e00581662a5f68",
    12: "1154a174991d631e0373672a33419dea",
    13: "86b2147c56f6f6171b5a2e45db58fd73",
    14: "039978ef7de6b9b7cbfa4d4d30e1d87c",
    15: "ccbb23124b4694fc2aa495a47218f226",
    16: "5a2776d3d8f878aa5af52b0bf5441471",
    17: "62d91a700f26ae95ec2efa3b03c38ea3",
    18: "aedc4647dc24cb773fdcf009067c8142",
    19: "adb23b1198198495827180589b92e5e5",
    20: "88c015a8acd6ffee828eefd30e88c93f",
    21: "200b7f2c6bd49390694f6766327d32f2",
    22: "d0fed1c311f87fe4953423f8db15469e",
    23: "695267c4effc919788f7d6058515d9e6",
    24: "e3ba45dbfc81ede15d1fd2e2c45e9bd9",
    25: "b408795c12ec5934119709f3ad5cda5b",
    26: "78e70aca53bceaf0d66cddec1e93dd31",
    27: "046f7c1642ce4a4855887a60e340709d",
}
