package graft.io

import graft.io.ProtoWire.Reader

/** Adtech domain records + wire decoders for the reference's proto
  * schemas (field numbers from `src/proto/bid.proto:12-40`,
  * `common.proto:14-26`, `profile.proto:27-145`, and the used OpenRTB
  * subset `vendor/openrtb.proto:30-51,779-814,988-1073,1107-1118`).
  *
  * Proto3 defaults apply: absent scalar = ""/0. Only the six
  * BidRequest leaves the pipeline reads are decoded
  * (`utils/BidLogUtils.java:126-132`).
  */
object AdtechProtos {

  /** Flattened BidLog — the only BidRequest leaves ever read. */
  final case class BidLogFlat(
      id: String, bundle: String, os: String, ifa: String,
      country: String, region: String,
      exchange: Int, receivedAt: Long, processedAt: Long,
      bidResult: Int, bidPrice: Int)

  final case class AppActivity(
      bundle: String, firstAt: Long, lastAt: Long, countPerExchange: Map[Int, Int])
  final case class GeoActivity(country: String, region: String)
  final case class DeviceProfileRec(
      os: Int, uuid: String, app: Seq[AppActivity],
      firstAt: Long, lastAt: Long, geo: Seq[GeoActivity])
  final case class AppProfileRec(
      bundle: String, userCount: Int, userCountPerExchange: Map[Int, Int])
  final case class DeviceIdRec(os: Int, uuid: String)
  final case class IappRec(bundle: String, numPurchasers: Long, totalAmount: Long)

  /** BidLog{1:bid_request{1:id,4:app{8:bundle},5:device{4:geo{3:country,
    * 4:region},14:os,20:ifa}}, 2:exchange, 3:received_at, 4:processed_at,
    * 5:bid_result, 6:bid_price} */
  def decodeBidLog(buf: Array[Byte]): BidLogFlat = {
    var id = ""; var bundle = ""; var os = ""; var ifa = ""
    var country = ""; var region = ""
    var exchange = 0; var receivedAt = 0L; var processedAt = 0L
    var bidResult = 0; var bidPrice = 0
    val r = new Reader(buf)
    while (r.hasMore) {
      val (f, wt) = r.key()
      f match {
        case 1 =>
          val br = r.subReader()
          while (br.hasMore) {
            val (bf, bwt) = br.key()
            bf match {
              case 1 => id = br.string()
              case 4 =>
                val app = br.subReader()
                while (app.hasMore) {
                  val (af, awt) = app.key()
                  if (af == 8) bundle = app.string() else app.skip(awt)
                }
              case 5 =>
                val dev = br.subReader()
                while (dev.hasMore) {
                  val (df, dwt) = dev.key()
                  df match {
                    case 4 =>
                      val geo = dev.subReader()
                      while (geo.hasMore) {
                        val (gf, gwt) = geo.key()
                        gf match {
                          case 3 => country = geo.string()
                          case 4 => region = geo.string()
                          case _ => geo.skip(gwt)
                        }
                      }
                    case 14 => os = dev.string()
                    case 20 => ifa = dev.string()
                    case _  => dev.skip(dwt)
                  }
                }
              case _ => br.skip(bwt)
            }
          }
        case 2 => exchange = r.varint().toInt
        case 3 => receivedAt = r.varint()
        case 4 => processedAt = r.varint()
        case 5 => bidResult = r.varint().toInt
        case 6 => bidPrice = r.varint().toInt
        case _ => r.skip(wt)
      }
    }
    BidLogFlat(id, bundle, os, ifa, country, region, exchange, receivedAt,
      processedAt, bidResult, bidPrice)
  }

  /** DeviceProfile{1:device_id{1:os,2:uuid}, 5:app[]{1:bundle,2:first_at,
    * 3:last_at,6:count_per_exchange}, 9:first_at, 10:last_at,
    * 11:geo[]{1:country,2:region}} */
  def decodeDeviceProfile(buf: Array[Byte]): DeviceProfileRec = {
    var os = 0; var uuid = ""
    val apps = Seq.newBuilder[AppActivity]
    val geos = Seq.newBuilder[GeoActivity]
    var firstAt = 0L; var lastAt = 0L
    val r = new Reader(buf)
    while (r.hasMore) {
      val (f, wt) = r.key()
      f match {
        case 1 =>
          val idr = r.subReader()
          while (idr.hasMore) {
            val (idf, idwt) = idr.key()
            idf match {
              case 1 => os = idr.varint().toInt
              case 2 => uuid = idr.string()
              case _ => idr.skip(idwt)
            }
          }
        case 5 =>
          val ar = r.subReader()
          var bundle = ""; var aFirst = 0L; var aLast = 0L
          val cpe = Map.newBuilder[Int, Int]
          while (ar.hasMore) {
            val (af, awt) = ar.key()
            af match {
              case 1 => bundle = ar.string()
              case 2 => aFirst = ar.varint()
              case 3 => aLast = ar.varint()
              case 6 => cpe += ProtoWire.mapEntryInt(ar.subReader())
              case _ => ar.skip(awt)
            }
          }
          apps += AppActivity(bundle, aFirst, aLast, cpe.result())
        case 9  => firstAt = r.varint()
        case 10 => lastAt = r.varint()
        case 11 =>
          val gr = r.subReader()
          var country = ""; var region = ""
          while (gr.hasMore) {
            val (gf, gwt) = gr.key()
            gf match {
              case 1 => country = gr.string()
              case 2 => region = gr.string()
              case _ => gr.skip(gwt)
            }
          }
          geos += GeoActivity(country, region)
        case _ => r.skip(wt)
      }
    }
    DeviceProfileRec(os, uuid, apps.result(), firstAt, lastAt, geos.result())
  }

  /** AppProfile{1:bundle, 2:user_count, 3:_user_count_per_exchange} */
  def decodeAppProfile(buf: Array[Byte]): AppProfileRec = {
    var bundle = ""; var userCount = 0
    val cpe = Map.newBuilder[Int, Int]
    val r = new Reader(buf)
    while (r.hasMore) {
      val (f, wt) = r.key()
      f match {
        case 1 => bundle = r.string()
        case 2 => userCount = r.varint().toInt
        case 3 => cpe += ProtoWire.mapEntryInt(r.subReader())
        case _ => r.skip(wt)
      }
    }
    AppProfileRec(bundle, userCount, cpe.result())
  }

  /** InAppPurchaseProfile{1:bundle, 2:num_purchasers, 3:total_amount} */
  def decodeIapp(buf: Array[Byte]): IappRec = {
    var bundle = ""; var np = 0L; var ta = 0L
    val r = new Reader(buf)
    while (r.hasMore) {
      val (f, wt) = r.key()
      f match {
        case 1 => bundle = r.string()
        case 2 => np = r.varint()
        case 3 => ta = r.varint()
        case _ => r.skip(wt)
      }
    }
    IappRec(bundle, np, ta)
  }

  /** DeviceId{1:os, 2:uuid} */
  def decodeDeviceId(buf: Array[Byte]): DeviceIdRec = {
    var os = 0; var uuid = ""
    val r = new Reader(buf)
    while (r.hasMore) {
      val (f, wt) = r.key()
      f match {
        case 1 => os = r.varint().toInt
        case 2 => uuid = r.string()
        case _ => r.skip(wt)
      }
    }
    DeviceIdRec(os, uuid)
  }
}
