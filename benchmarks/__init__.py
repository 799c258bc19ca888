"""In-tree benchmark suite (the reference's /benchmark directory
analogue): poly/lib/binfhe/encoding/serialize/compare suites, run via
`python -m benchmarks.run`.  Committed raw artifacts: benchmarks/results/.
"""
