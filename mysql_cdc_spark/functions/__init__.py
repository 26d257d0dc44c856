"""Reusable column expressions and distributed-scan building blocks
shared by the operator modules.

    scan.py        — chunked distributed prefix-scan (running sums /
                     running counts without a single-task global window)
    text.py        — tokenization contract + text-analysis expressions
    hashing.py     — engine-neutral hashing (md5-derived minhash /
                     simhash bits / quantized-integer embedding math)
"""
