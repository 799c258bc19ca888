module github.com/fhe-tpu/fhe/bindings/go

go 1.21
