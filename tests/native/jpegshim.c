/* Test-only oracle shim over the system libjpeg(-turbo).
 *
 * Built on demand by the test suite (gcc + libjpeg62-turbo-dev are in the
 * image; nothing is installed) and driven as a SUBPROCESS so a library
 * abort can never take the test runner down.  It exists to validate the
 * repo's pure-Python JPEG decoders in
 * _lakehouse_architecture_for_e_commerce_transactions_spark/operators/multimodal.py
 * against the reference implementation — in particular the T.81 Annex D
 * arithmetic-coded path, where agreement with libjpeg's jdarith/jcarith is
 * the strongest available ground truth.  The production decode path never
 * uses this binary.
 *
 * Modes (all I/O on stdin/stdout, binary):
 *   encode W H NCOMP QUALITY ARITH PROGRESSIVE SUBSAMP RESTART
 *       raw W*H*NCOMP bytes in -> JPEG out.  NCOMP 1 (gray) or 3 (RGB).
 *       SUBSAMP: 0 = 1x1x1 (no subsampling), 1 = 2x2 luma (h2v2),
 *       2 = 2x1 luma (h2v1).  RESTART = restart interval in MCUs (0 off).
 *   decode
 *       JPEG in -> "W H NCOMP\n" + raw pixels out.
 *   coefs
 *       JPEG in -> "NCOMP\n" then per component "ID WBLK HBLK\n" followed
 *       by WBLK*HBLK little-endian int16[64] blocks in storage (zigzag)
 *       order — the quantized coefficients exactly as entropy-decoded,
 *       immune to IDCT/color-convert rounding, so the comparison with the
 *       pure-Python entropy decoder is bit-exact.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>
#include <jerror.h>

struct jmp_err {
  struct jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void on_error(j_common_ptr cinfo) {
  struct jmp_err *e = (struct jmp_err *)cinfo->err;
  (*cinfo->err->output_message)(cinfo);
  longjmp(e->jb, 1);
}

static unsigned char *read_all(FILE *f, size_t *n) {
  size_t cap = 1 << 20, len = 0;
  unsigned char *buf = malloc(cap);
  if (!buf) return NULL;
  for (;;) {
    if (len == cap) {
      cap *= 2;
      buf = realloc(buf, cap);
      if (!buf) return NULL;
    }
    size_t got = fread(buf + len, 1, cap - len, f);
    len += got;
    if (got == 0) break;
  }
  *n = len;
  return buf;
}

static int do_encode(int argc, char **argv) {
  if (argc < 10) {
    fprintf(stderr, "encode needs W H NCOMP QUALITY ARITH PROG SUBSAMP RESTART\n");
    return 2;
  }
  int w = atoi(argv[2]), h = atoi(argv[3]), nc = atoi(argv[4]);
  int quality = atoi(argv[5]), arith = atoi(argv[6]), prog = atoi(argv[7]);
  int subsamp = atoi(argv[8]), restart = atoi(argv[9]);
  if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) {
    fprintf(stderr, "bad dims\n");
    return 2;
  }
  size_t need = (size_t)w * h * nc, got = 0;
  unsigned char *raw = read_all(stdin, &got);
  if (!raw || got < need) {
    fprintf(stderr, "short pixel input: want %zu got %zu\n", need, got);
    return 2;
  }
  struct jpeg_compress_struct cinfo;
  struct jmp_err err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_error;
  if (setjmp(err.jb)) {
    jpeg_destroy_compress(&cinfo);
    return 3;
  }
  jpeg_create_compress(&cinfo);
  unsigned char *out = NULL;
  unsigned long outlen = 0;
  jpeg_mem_dest(&cinfo, &out, &outlen);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = nc;
  cinfo.in_color_space = nc == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  if (!arith) cinfo.optimize_coding = TRUE;
  if (prog) jpeg_simple_progression(&cinfo);
  if (nc == 3) {
    if (subsamp == 0) {
      cinfo.comp_info[0].h_samp_factor = 1;
      cinfo.comp_info[0].v_samp_factor = 1;
    } else if (subsamp == 2) {
      cinfo.comp_info[0].h_samp_factor = 2;
      cinfo.comp_info[0].v_samp_factor = 1;
    } /* subsamp == 1: keep the 2x2 default */
  }
  cinfo.restart_interval = restart;
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = raw + (size_t)cinfo.next_scanline * w * nc;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fwrite(out, 1, outlen, stdout);
  free(out);
  free(raw);
  return 0;
}

static int do_decode(void) {
  size_t n = 0;
  unsigned char *jpg = read_all(stdin, &n);
  if (!jpg || n == 0) return 2;
  struct jpeg_decompress_struct cinfo;
  struct jmp_err err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_error;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, jpg, n);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  int nc = cinfo.output_components;
  printf("%d %d %d\n", w, h, nc);
  fflush(stdout);
  unsigned char *row = malloc((size_t)w * nc);
  while ((int)cinfo.output_scanline < h) {
    JSAMPROW r = row;
    jpeg_read_scanlines(&cinfo, &r, 1);
    fwrite(row, 1, (size_t)w * nc, stdout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  free(row);
  free(jpg);
  return 0;
}

static int do_coefs(void) {
  size_t n = 0;
  unsigned char *jpg = read_all(stdin, &n);
  if (!jpg || n == 0) return 2;
  struct jpeg_decompress_struct cinfo;
  struct jmp_err err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_error;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, jpg, n);
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr *arrays = jpeg_read_coefficients(&cinfo);
  printf("%d\n", cinfo.num_components);
  for (int ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = &cinfo.comp_info[ci];
    int wb = comp->width_in_blocks, hb = comp->height_in_blocks;
    printf("%d %d %d\n", comp->component_id, wb, hb);
    fflush(stdout);
    for (int by = 0; by < hb; by++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, arrays[ci], by, 1, FALSE);
      for (int bx = 0; bx < wb; bx++)
        fwrite(rows[0][bx], sizeof(JCOEF), DCTSIZE2, stdout);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  free(jpg);
  return 0;
}

int main(int argc, char **argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: jpegshim encode|decode|coefs ...\n");
    return 2;
  }
  if (!strcmp(argv[1], "encode")) return do_encode(argc, argv);
  if (!strcmp(argv[1], "decode")) return do_decode();
  if (!strcmp(argv[1], "coefs")) return do_coefs();
  fprintf(stderr, "unknown mode %s\n", argv[1]);
  return 2;
}
