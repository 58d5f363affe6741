/* Independent JPEG producer/ground-truth for the arithmetic-decode
 * fixtures (tests/fixtures_arith_jpeg.py): drives the SYSTEM
 * libjpeg-turbo (an encoder this repo shares no code with) so the
 * repo's pure-Python arithmetic decoder is verified against streams a
 * real codec produced — the same independent-producer discipline as
 * tests/fixtures_real_jpeg.py.
 *
 * Build:  gcc -O2 -o /tmp/jpeg_arith_tool tools/jpeg_arith_tool.c -ljpeg
 *
 * Encode: jpeg_arith_tool encode W H COMPONENTS QUALITY ARITH PROGRESSIVE \
 *            RESTART SAMP < raw_bytes > out.jpg
 *         raw stdin = W*H*COMPONENTS bytes, row-major, RGB or gray.
 *         ARITH/PROGRESSIVE: 0|1.  RESTART: restart interval in MCUs
 *         (0 = none).  SAMP: 0 = 4:4:4 (1x1), 1 = 4:2:0 (2x2 luma).
 * Decode: jpeg_arith_tool decode < in.jpg > raw_bytes
 *         stdout = "W H C\n" header then W*H*C decoded bytes.
 * Coef:   jpeg_arith_tool coef < in.jpg > coefficient dump
 *         stdout = "C\n" then per component "ci BW BH\n" followed by
 *         BW*BH*64 little-endian int16 quantized coefficients in
 *         natural (row-major within block) order, blocks row-major —
 *         the IDCT-independent exact ground truth for entropy decode.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *read_all(FILE *f, size_t *n) {
  size_t cap = 1 << 20, len = 0;
  unsigned char *buf = malloc(cap);
  size_t got;
  while ((got = fread(buf + len, 1, cap - len, f)) > 0) {
    len += got;
    if (len == cap) { cap <<= 1; buf = realloc(buf, cap); }
  }
  *n = len;
  return buf;
}

static int do_encode(int w, int h, int ncomp, int quality, int arith,
                     int progressive, int restart, int samp) {
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  size_t rawlen, outlen = 0;
  unsigned char *raw = read_all(stdin, &rawlen);
  unsigned char *out = NULL;
  if (rawlen < (size_t)w * h * ncomp) { fprintf(stderr, "short input\n"); return 2; }

  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &out, (unsigned long *)&outlen);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = ncomp;
  cinfo.in_color_space = ncomp == 3 ? JCS_RGB : JCS_GRAYSCALE;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  cinfo.optimize_coding = FALSE;
  if (progressive) jpeg_simple_progression(&cinfo);
  cinfo.restart_interval = restart;
  if (ncomp == 3 && samp == 0) { /* 4:4:4 */
    cinfo.comp_info[0].h_samp_factor = 1;
    cinfo.comp_info[0].v_samp_factor = 1;
  } /* default is 4:2:0 (2x2) */
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = raw + (size_t)cinfo.next_scanline * w * ncomp;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fwrite(out, 1, outlen, stdout);
  return 0;
}

static int do_decode(void) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  size_t n;
  unsigned char *buf = read_all(stdin, &n);
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, n);
  jpeg_read_header(&cinfo, TRUE);
  /* bit-exact reference path: no fancy upsampling/smoothing */
  cinfo.do_fancy_upsampling = FALSE;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height, c = cinfo.output_components;
  printf("%d %d %d\n", w, h, c);
  unsigned char *row = malloc((size_t)w * c);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW rp = row;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    fwrite(row, 1, (size_t)w * c, stdout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

static int do_coef(void) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  size_t n;
  unsigned char *buf = read_all(stdin, &n);
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, n);
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&cinfo);
  printf("%d\n", cinfo.num_components);
  for (int ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = cinfo.comp_info + ci;
    JDIMENSION bw = comp->width_in_blocks, bh = comp->height_in_blocks;
    printf("%d %u %u\n", ci, bw, bh);
    for (JDIMENSION by = 0; by < bh; by++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)
        ((j_common_ptr)&cinfo, coefs[ci], by, 1, FALSE);
      fwrite(rows[0], sizeof(JCOEF), (size_t)bw * DCTSIZE2, stdout);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 2 && !strcmp(argv[1], "coef")) return do_coef();
  if (argc >= 2 && !strcmp(argv[1], "decode")) return do_decode();
  if (argc == 10 && !strcmp(argv[1], "encode"))
    return do_encode(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                     atoi(argv[5]), atoi(argv[6]), atoi(argv[7]),
                     atoi(argv[8]), atoi(argv[9]));
  fprintf(stderr, "usage: %s encode W H C Q ARITH PROG RESTART SAMP | decode\n", argv[0]);
  return 1;
}
