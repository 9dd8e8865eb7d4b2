#!/usr/bin/env python3
# SPDX-License-Identifier: MIT
# helper utilities

def add(a, b):
    return a + b  # inline comments don't count
