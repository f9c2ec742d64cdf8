/*
 * Golden-vector generator for the jpegtpu test suite.
 *
 * Links against the READ-ONLY reference implementation
 * (/root/reference/natural_c, see tools/golden_gen/Makefile) and dumps every
 * intermediate stage of its encode pipeline to flat binary files. The test
 * suite loads these as the bit-parity ground truth (SURVEY.md §4, §7.3).
 *
 * This file contains no reference code; it only calls the reference's public
 * stage API (converter.h, dct.h, quantization.h, zigzag.h, rle.h, huffman.h).
 *
 * Usage: dump_stages <input.bmp> <output_dir>
 * Writes: y.u8  centered.i8  dct.f32  quant.i16  zigzag.i16
 *         rle_symbols.u8  rle_codes.u16  rle_codebits.u8  stream.u8  meta.txt
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>

#include "bmp_handler.h"
#include "converter.h"
#include "dct.h"
#include "quantization.h"
#include "zigzag.h"
#include "rle.h"
#include "huffman.h"
#include "jpeg_handler.h"

static void dump(const char *dir, const char *name, const void *buf, size_t nbytes) {
    char path[1024];
    snprintf(path, sizeof(path), "%s/%s", dir, name);
    FILE *f = fopen(path, "wb");
    if (!f) { perror(path); exit(1); }
    fwrite(buf, 1, nbytes, f);
    fclose(f);
}

int main(int argc, char **argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: %s <input.bmp> <output_dir>\n", argv[0]);
        return 1;
    }
    const char *in = argv[1], *dir = argv[2];

    BMPImage *img = loadBMPImage(in);
    if (!img) { fprintf(stderr, "failed to load %s\n", in); return 1; }

    YImage *y = convertBMPToJPEGGrayscale(img);
    CenteredYImage *c = centerYImage(y);
    DCTImage *d = performDCT(c);
    QuantizedImage *q = quantizeImage(d);
    ZigZagData *z = performZigZag(q);
    RLEData *r = performRLE(z);
    JpegEncoderBuffer *b = encodeHuffman(r, z->totalBlocks);

    size_t n = (size_t)y->width * y->height;
    dump(dir, "y.u8", y->data, n);
    dump(dir, "centered.i8", c->data, n);
    dump(dir, "dct.f32", d->coefficients, n * sizeof(float));
    dump(dir, "quant.i16", q->data, n * sizeof(int16_t));
    dump(dir, "zigzag.i16", z->data, (size_t)z->totalBlocks * 64 * sizeof(int16_t));

    /* RLE symbol stream: struct-of-arrays for easy numpy loading */
    {
        uint8_t *syms = malloc(r->count);
        uint16_t *codes = malloc(r->count * sizeof(uint16_t));
        uint8_t *bits = malloc(r->count);
        for (size_t i = 0; i < (size_t)r->count; i++) {
            syms[i] = r->data[i].symbol;
            codes[i] = r->data[i].code;
            bits[i] = r->data[i].codeBits;
        }
        dump(dir, "rle_symbols.u8", syms, r->count);
        dump(dir, "rle_codes.u16", codes, r->count * sizeof(uint16_t));
        dump(dir, "rle_codebits.u8", bits, r->count);
        free(syms); free(codes); free(bits);
    }

    dump(dir, "stream.u8", b->data, b->size);

    {
        char path[1024];
        snprintf(path, sizeof(path), "%s/meta.txt", dir);
        FILE *f = fopen(path, "w");
        fprintf(f, "orig_width %d\norig_height %d\npad_width %d\npad_height %d\n"
                   "total_blocks %d\nrle_count %d\nstream_bytes %zu\n",
                img->width, img->height, y->width, y->height,
                z->totalBlocks, (int)r->count, b->size);
        fclose(f);
    }

    printf("ok %s: %dx%d pad %dx%d blocks %d rle %d stream %zu\n",
           in, img->width, img->height, y->width, y->height,
           z->totalBlocks, (int)r->count, b->size);
    return 0;
}
