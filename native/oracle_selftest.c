/*
 * oracle_selftest.c — standalone sanitizer harness (SURVEY.md section 5.2:
 * the reference ships no sanitizer story; this runs its full pipeline under
 * ASan/UBSan via `make -C native sanitize`).
 *
 * Drives the complete reference encode+decode over pseudo-random blocks at
 * several qualities and block sizes, exercising every module: dct,
 * quantization (both adaptive modes), entropy (zigzag, RLE, Huffman,
 * size estimation, decode). Exit 0 unless a sanitizer aborts or a
 * round-trip invariant breaks.
 */
#include <dct.h>
#include <quantization.h>
#include <entropy.h>
#include <stdio.h>
#include <stdlib.h>

static unsigned int state = 12345u;
static unsigned int next_rand(void) {
    state = state * 1664525u + 1013904223u;
    return state >> 16;
}

int main(void) {
    const int sizes[] = {4, 8, 16};
    const int qualities[] = {1, 50, 100};
    for (int si = 0; si < 3; ++si) {
        int n = sizes[si];
        for (int qi = 0; qi < 3; ++qi) {
            for (int adaptive = 0; adaptive <= 1; ++adaptive) {
                DCTContext *dctx = dct_init(n);
                QuantContext *qctx = quant_init(n, qualities[qi], adaptive);
                for (int trial = 0; trial < 50; ++trial) {
                    double **in = alloc_array(n, n);
                    for (int i = 0; i < n; ++i)
                        for (int j = 0; j < n; ++j)
                            in[i][j] = (double)(next_rand() % 256) - 128.0;
                    double var = calculate_block_variance(in, n);
                    double **coeffs = alloc_array(n, n);
                    dct_forward(dctx, in, coeffs);
                    int **qc = alloc_int_array(n, n);
                    quantize(qctx, coeffs, qc, var);

                    EntropyContext *ectx = entropy_init(1);
                    int count = run_length_encode(ectx, qc, n);
                    if (count <= 0) { fprintf(stderr, "empty RLE\n"); return 1; }
                    build_huffman_codes(ectx);
                    (void)get_encoded_size(ectx);

                    int **qc2 = alloc_int_array(n, n);
                    run_length_decode(ectx, qc2, n);
                    for (int i = 0; i < n; ++i)
                        for (int j = 0; j < n; ++j)
                            if (qc[i][j] != qc2[i][j]) {
                                fprintf(stderr, "RLE round-trip mismatch\n");
                                return 1;
                            }
                    double **deq = alloc_array(n, n);
                    dequantize(qctx, qc2, deq, var);
                    double **rec = alloc_array(n, n);
                    dct_inverse(dctx, deq, rec);

                    free_array(in, n); free_array(coeffs, n);
                    free_array(deq, n); free_array(rec, n);
                    free_int_array(qc, n); free_int_array(qc2, n);
                    entropy_free(ectx);
                }
                dct_free(dctx); quant_free(qctx);
            }
        }
    }
    printf("oracle sanitizer self-test OK\n");
    return 0;
}
